"""Independent torch oracle of the big-lama FFCResNetGenerator.

Implements the published generator graph (advimman/lama `saicinpainting`,
the dependency the reference imports in test/remove_foreground.py:7) with
EXACT release state-dict naming (`model.<i>.ffc.convl2l.weight`, ...), so
converter tests exercise the same key families a released `best.ckpt`
contains. Written from the published architecture description — not copied.
"""

import torch
import torch.nn as nn


class FourierUnit(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.conv_layer = nn.Conv2d(channels * 2, channels * 2, 1,
                                    bias=False)
        self.bn = nn.BatchNorm2d(channels * 2)
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        b, c, h, w = x.shape
        ff = torch.fft.rfftn(x, dim=(-2, -1), norm="ortho")
        ff = torch.stack((ff.real, ff.imag), dim=-1)       # [B,C,H,Wf,2]
        ff = ff.permute(0, 1, 4, 2, 3).reshape(b, c * 2, h, -1)
        ff = self.relu(self.bn(self.conv_layer(ff)))
        ff = ff.reshape(b, c, 2, h, -1).permute(0, 1, 3, 4, 2)
        ff = torch.complex(ff[..., 0], ff[..., 1])
        return torch.fft.irfftn(ff, s=(h, w), dim=(-2, -1), norm="ortho")


class SpectralTransform(nn.Module):
    def __init__(self, in_channels, out_channels):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.Conv2d(in_channels, out_channels // 2, 1, bias=False),
            nn.BatchNorm2d(out_channels // 2), nn.ReLU(inplace=True))
        self.fu = FourierUnit(out_channels // 2)
        self.conv2 = nn.Conv2d(out_channels // 2, out_channels, 1,
                               bias=False)

    def forward(self, x):
        x = self.conv1(x)
        return self.conv2(x + self.fu(x))


class FFC(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, ratio_gin,
                 ratio_gout, stride=1, padding=0):
        super().__init__()
        in_cg = int(in_channels * ratio_gin)
        in_cl = in_channels - in_cg
        out_cg = int(out_channels * ratio_gout)
        out_cl = out_channels - out_cg
        self.ratio_gout = ratio_gout

        def conv(ic, oc):
            if ic == 0 or oc == 0:
                return nn.Identity()
            return nn.Conv2d(ic, oc, kernel_size, stride, padding,
                             bias=False, padding_mode="reflect")

        self.convl2l = conv(in_cl, out_cl)
        self.convl2g = conv(in_cl, out_cg)
        self.convg2l = conv(in_cg, out_cl)
        self.convg2g = (nn.Identity() if in_cg == 0 or out_cg == 0
                        else SpectralTransform(in_cg, out_cg))

    def forward(self, x):
        x_l, x_g = x if isinstance(x, tuple) else (x, 0)
        out_l, out_g = 0, 0
        if self.ratio_gout != 1:
            out_l = self.convl2l(x_l) + (
                self.convg2l(x_g) if torch.is_tensor(x_g) else 0)
        if self.ratio_gout != 0:
            out_g = (self.convl2g(x_l) if torch.is_tensor(x_l) else 0) + (
                self.convg2g(x_g) if torch.is_tensor(x_g) else 0)
        return out_l, out_g


class FFC_BN_ACT(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, ratio_gin,
                 ratio_gout, stride=1, padding=0):
        super().__init__()
        self.ffc = FFC(in_channels, out_channels, kernel_size, ratio_gin,
                       ratio_gout, stride, padding)
        out_cg = int(out_channels * ratio_gout)
        self.bn_l = (nn.Identity() if out_cg == out_channels
                     else nn.BatchNorm2d(out_channels - out_cg))
        self.bn_g = nn.Identity() if out_cg == 0 else nn.BatchNorm2d(out_cg)
        self.act_l = nn.ReLU(inplace=True)
        self.act_g = nn.ReLU(inplace=True)

    def forward(self, x):
        x_l, x_g = self.ffc(x)
        if torch.is_tensor(x_l):
            x_l = self.act_l(self.bn_l(x_l))
        if torch.is_tensor(x_g):
            x_g = self.act_g(self.bn_g(x_g))
        return x_l, x_g


class FFCResnetBlock(nn.Module):
    def __init__(self, dim, ratio):
        super().__init__()
        self.conv1 = FFC_BN_ACT(dim, dim, 3, ratio, ratio, padding=1)
        self.conv2 = FFC_BN_ACT(dim, dim, 3, ratio, ratio, padding=1)

    def forward(self, x):
        x_l, x_g = x
        h_l, h_g = self.conv2(self.conv1((x_l, x_g)))
        return x_l + h_l, x_g + h_g


class ConcatTupleLayer(nn.Module):
    def forward(self, x):
        x_l, x_g = x
        parts = [t for t in (x_l, x_g) if torch.is_tensor(t)]
        return torch.cat(parts, dim=1)


class FFCResNetGenerator(nn.Module):
    def __init__(self, input_nc=4, output_nc=3, ngf=64, n_downsampling=3,
                 n_blocks=18, resnet_ratio=0.75, max_features=1024):
        super().__init__()
        model = [nn.ReflectionPad2d(3),
                 FFC_BN_ACT(input_nc, ngf, 7, 0, 0)]
        for i in range(n_downsampling):
            gout = resnet_ratio if i == n_downsampling - 1 else 0
            model.append(FFC_BN_ACT(
                min(max_features, ngf * 2 ** i),
                min(max_features, ngf * 2 ** (i + 1)),
                3, 0, gout, stride=2, padding=1))
        dim = min(max_features, ngf * 2 ** n_downsampling)
        for _ in range(n_blocks):
            model.append(FFCResnetBlock(dim, resnet_ratio))
        model.append(ConcatTupleLayer())
        for i in range(n_downsampling):
            model += [nn.ConvTranspose2d(
                min(max_features, ngf * 2 ** (n_downsampling - i)),
                min(max_features, ngf * 2 ** (n_downsampling - i - 1)),
                3, stride=2, padding=1, output_padding=1),
                nn.BatchNorm2d(
                    min(max_features, ngf * 2 ** (n_downsampling - i - 1))),
                nn.ReLU(True)]
        model += [nn.ReflectionPad2d(3),
                  nn.Conv2d(ngf, output_nc, 7), nn.Sigmoid()]
        self.model = nn.Sequential(*model)

    def forward(self, x):
        return self.model(x)


def randomize_batchnorm_stats(module, gen):
    """Give every BatchNorm non-trivial running stats so parity tests
    actually exercise the batch_stats mapping."""
    for m in module.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(
                torch.randn(m.running_mean.shape, generator=gen) * 0.3)
            m.running_var.copy_(
                torch.rand(m.running_var.shape, generator=gen) * 1.5 + 0.3)
