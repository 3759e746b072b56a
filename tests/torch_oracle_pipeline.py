"""Independent torch oracle of the FULL DiffusionHandles composition.

A clean-room torch implementation of the reference's end-to-end algorithm
(reference: diffhandles/diffusion_handles.py:36-166,
diffhandles/stable_null_inverter.py, diffhandles/guided_stable_diffuser.py
:155-488, diffhandles/losses.py) built on the component oracles
(torch_oracle_sd.py). It exists to catch the composition bugs the
per-model oracles cannot: DDIM prev/next closed-form indexing, CFG
combination order, per-timestep fresh-Adam null-text semantics with the
published early stop, activation recording timing, guidance-weight
schedule composition, and the guidance gradient-descent loop.

Everything here follows the published/reference ALGORITHM (plain loops,
torch autograd, torch.optim.Adam) rather than this repo's scan/while
formulation — an off-by-one in either implementation breaks parity.

This is test-support code, NOT part of the framework.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


class OracleDDIMSchedule:
    """diffusers DDIMScheduler numerics at the reference settings
    (scaled_linear 0.00085..0.012, leading spacing, eta=0,
    set_alpha_to_one=False, epsilon prediction; reference:
    guided_stable_diffuser.py:31-32) + the inverter's closed-form
    prev/next steps (stable_null_inverter.py:25-43)."""

    def __init__(self, num_inference_steps: int,
                 num_train_timesteps: int = 1000):
        betas = torch.linspace(0.00085 ** 0.5, 0.012 ** 0.5,
                               num_train_timesteps,
                               dtype=torch.float64) ** 2
        self.alphas_cumprod = torch.cumprod(1.0 - betas, dim=0).float()
        self.final_alpha_cumprod = self.alphas_cumprod[0]
        self.ratio = num_train_timesteps // num_inference_steps
        self.timesteps = (np.arange(num_inference_steps)
                          * self.ratio).round()[::-1].astype(np.int64)
        self.num_inference_steps = num_inference_steps

    def _alpha(self, t: int):
        if t >= 0:
            return self.alphas_cumprod[t]
        return self.final_alpha_cumprod

    def step(self, eps, t: int, sample):
        """x_t -> x_{t-ratio} (DDIMScheduler.step, eta=0 == prev_step)."""
        a_t = self._alpha(t)
        a_prev = self._alpha(t - self.ratio)
        x0 = (sample - (1 - a_t) ** 0.5 * eps) / a_t ** 0.5
        return a_prev ** 0.5 * x0 + (1 - a_prev) ** 0.5 * eps

    def next_step(self, eps, t: int, sample):
        """Inversion step (stable_null_inverter.py:35-43): current alpha
        at t-ratio (final for <0), next alpha at t."""
        a_cur = self._alpha(t - self.ratio)
        a_next = self._alpha(t)
        x0 = (sample - (1 - a_cur) ** 0.5 * eps) / a_cur ** 0.5
        return a_next ** 0.5 * x0 + (1 - a_next) ** 0.5 * eps


# ---------------------------------------------------------------------------
# Losses (reference: diffhandles/losses.py, literal semantics)
# ---------------------------------------------------------------------------

def _local_average_feat_l1(f1, f2, x1, y1, x2, y2, patch_size):
    w1 = torch.zeros((f1.shape[-2], f1.shape[-1]), dtype=f1.dtype)
    w2 = torch.zeros((f2.shape[-2], f2.shape[-1]), dtype=f2.dtype)
    w1[y1, x1] = 1
    w2[y2, x2] = 1
    pool = torch.nn.AvgPool2d(patch_size, stride=1, padding=patch_size // 2)
    eps = 1e-10
    f1a = pool(w1[None, None] * f1[None]) / (pool(w1[None, None]) + eps)
    f2a = pool(w2[None, None] * f2[None]) / (pool(w2[None, None]) + eps)
    loss = (f1a[0, :, y1, x1] - f2a[0, :, y2, x2]).abs()
    return loss.mean(dim=-1).mean()


def _average_feat_l1(f1, f2, x1, y1, x2, y2):
    return (f1[..., y1, x1].mean(dim=-1)
            - f2[..., y2, x2].mean(dim=-1)).abs().mean()


def oracle_process_correspondences(correspondences, img_res: int,
                                   latent_res: int, bg_erosion: int = 0):
    """reference guided_stable_diffuser.py:490-584 (with the reference's
    hardcoded 64 generalized to latent_res)."""
    corr = np.asarray(correspondences).reshape(-1, 4)
    keep = ((corr[:, 2] >= 0) & (corr[:, 2] < img_res)
            & (corr[:, 3] >= 0) & (corr[:, 3] < img_res))
    ox, oy, tx, ty = [corr[keep, i].astype(np.int64) for i in range(4)]
    scale = img_res // latent_res
    ox, oy, tx, ty = ox // scale, oy // scale, tx // scale, ty // scale

    bg_mask_orig = np.ones((latent_res, latent_res), np.bool_)
    if len(ox):
        bg_mask_orig[oy, ox] = False
    bg_mask_trans = np.ones((latent_res, latent_res), np.bool_)
    if len(tx):
        bg_mask_trans[ty, tx] = False
    if bg_erosion > 0:
        import scipy.ndimage
        bg_mask_orig = scipy.ndimage.binary_erosion(
            bg_mask_orig, iterations=bg_erosion)
        bg_mask_trans = scipy.ndimage.binary_erosion(
            bg_mask_trans, iterations=bg_erosion)
    bg_y, bg_x = np.nonzero(bg_mask_orig & bg_mask_trans)
    bg_y_orig, bg_x_orig = np.nonzero(bg_mask_orig)
    bg_y_trans, bg_x_trans = np.nonzero(bg_mask_trans)
    return dict(original_x=ox, original_y=oy, transformed_x=tx,
                transformed_y=ty, background_x=bg_x, background_y=bg_y,
                background_x_orig=bg_x_orig, background_y_orig=bg_y_orig,
                background_x_trans=bg_x_trans, background_y_trans=bg_y_trans)


def oracle_foreground_loss(acts, acts_orig, pc, patch_size, act_size):
    """acts/acts_orig: [C, H, W]."""
    f_orig = F.interpolate(acts_orig[None], act_size, mode="bilinear")[0]
    f_cur = F.interpolate(acts[None], act_size, mode="bilinear")[0]
    return _local_average_feat_l1(
        f_orig, f_cur, pc["original_x"], pc["original_y"],
        pc["transformed_x"], pc["transformed_y"], patch_size)


def oracle_background_loss(acts, acts_orig, pc, patch_size, act_size,
                           loss_type):
    f_orig = F.interpolate(acts_orig[None], act_size, mode="bilinear")[0]
    f_cur = F.interpolate(acts[None], act_size, mode="bilinear")[0]
    if loss_type == "global_avg":
        return _average_feat_l1(
            f_orig, f_cur, pc["background_x_orig"], pc["background_y_orig"],
            pc["background_x_trans"], pc["background_y_trans"])
    if loss_type == "local_avg":
        return _local_average_feat_l1(
            f_orig, f_cur, pc["background_x"], pc["background_y"],
            pc["background_x"], pc["background_y"], patch_size)
    raise ValueError(loss_type)


class OracleWeightSchedule:
    """reference StepGuidanceWeightSchedule (:622-665) built exactly as
    guided_inference builds it (:335-373)."""

    def __init__(self, fg_weight, bg_weight, guidance_max_step,
                 schedule_type):
        fg_weight = fg_weight * 30
        bg_weight = bg_weight * 30
        gms = guidance_max_step
        if schedule_type == "constant":
            fg_fall = np.linspace(fg_weight, fg_weight, gms)
            bg_fall = np.linspace(bg_weight, bg_weight, gms)
        elif schedule_type == "linear":
            fg_fall = np.linspace(fg_weight, 0.0, gms)
            bg_fall = np.linspace(bg_weight, 0.0, gms)
        elif schedule_type == "quadratic":
            fg_fall = np.linspace(np.sqrt(fg_weight), 0.0, gms) ** 2
            bg_fall = np.linspace(np.sqrt(bg_weight), 0.0, gms) ** 2
        else:
            raise ValueError(schedule_type)
        den = []
        for t_idx in range(gms):
            if t_idx % 3 == 0:
                fgw, bgw = [0.0, 0.0, 7.5], [0.0, 0.0, 1.5]
            elif t_idx % 3 == 1:
                fgw, bgw = [0.0, 5.0, 0.0], [0.0, 1.5, 0.0]
            else:
                fgw, bgw = [0.0, 5.0, 7.5], [0.0, 1.5, 1.5]
            den.append((t_idx, (np.array(fgw) * fg_fall[t_idx]).tolist(),
                        (np.array(bgw) * bg_fall[t_idx]).tolist()))
        den.append((gms, [0.0] * 3, [0.0] * 3))
        opt = [(0, [2.5] * 3, [1.25] * 3), (1, [1.25] * 3, [2.5] * 3),
               (2, [1.25] * 3, [1.25] * 3), (3, [2.5] * 3, [2.5] * 3)]
        self.den = den
        self.opt = opt

    def __call__(self, denoising_step, optimization_step):
        for step, fgw, bgw in reversed(self.den):
            if denoising_step >= step:
                dfg, dbg = fgw, bgw
                break
        for step, fgw, bgw in reversed(self.opt):
            if optimization_step >= step:
                ofg, obg = fgw, bgw
                break
        return ([d * o for d, o in zip(dfg, ofg)],
                [d * o for d, o in zip(dbg, obg)])


# ---------------------------------------------------------------------------
# The composed pipeline
# ---------------------------------------------------------------------------

class OracleDiffusionHandles:
    """Torch DiffusionHandles at arbitrary (tiny) shapes.

    unet/vae/clip are the component oracles from torch_oracle_sd; token
    ids are supplied by the caller (the tokenizer is deterministic and
    tested separately). conf mirrors GuidedDiffuserConfig fields.
    """

    def __init__(self, unet, vae, clip, cond_ids, uncond_ids, conf):
        self.unet = unet
        self.vae = vae
        self.clip = clip
        self.conf = conf
        self.sched = OracleDDIMSchedule(conf["num_timesteps"])
        self.latent_res = unet.cfg.sample_size
        with torch.no_grad():
            self.cond_emb = clip(torch.from_numpy(np.asarray(
                cond_ids, np.int64)))
            self.uncond_emb = clip(torch.from_numpy(np.asarray(
                uncond_ids, np.int64)))

    # -- shared helpers (reference: guided_stable_diffuser.py:110-127,
    #    stable_null_inverter.py:78-110) --

    def init_depth(self, depth):
        """[1,1,H,W] disparity -> [1,1,h,w] in [-1,1] (bicubic)."""
        d = F.interpolate(depth, size=(self.latent_res, self.latent_res),
                          mode="bicubic", align_corners=False)
        dmin = d.amin(dim=[1, 2, 3], keepdim=True)
        dmax = d.amax(dim=[1, 2, 3], keepdim=True)
        return 2.0 * (d - dmin) / (dmax - dmin) - 1.0

    def image2latent(self, image):
        return self.vae.encode_mean(image * 2 - 1) * self.conf["scaling"]

    def latent2image(self, latents):
        img = self.vae.decode(latents / self.conf["scaling"])
        return ((img + 1) / 2).clamp(0, 1)

    def _unet_eps(self, latents, t: int, context, depth64):
        b = latents.shape[0]
        x = torch.cat([latents, depth64.expand(b, -1, -1, -1)], dim=1)
        if context.shape[0] != b:
            context = context.expand(b, -1, -1)
        eps, _ = self.unet(x, torch.tensor(int(t)), context)
        return eps

    def _unet_eps_acts(self, latents, t: int, context, depth64):
        b = latents.shape[0]
        x = torch.cat([latents, depth64.expand(b, -1, -1, -1)], dim=1)
        eps, acts = self.unet(x, torch.tensor(int(t)), context)
        return eps, acts

    # -- step 1: inversion (reference: stable_null_inverter.py:112-181) --

    def invert(self, img, depth_disparity, num_inner_steps=5,
               epsilon=1e-5):
        """img [1,3,H,W] in [0,1]; disparity [1,1,H,W] (pre-normalized).
        Returns (uncond_seq [T,1,77,D], init_noise [1,4,h,w],
        latents_traj list)."""
        sched = self.sched
        S = sched.num_inference_steps
        depth64 = self.init_depth(depth_disparity)
        gs = self.conf["guidance_scale"]

        with torch.no_grad():
            latent0 = self.image2latent(img)
            all_latent = [latent0]
            latent = latent0.clone()
            for i in range(S):
                t = int(sched.timesteps[S - i - 1])
                eps = self._unet_eps(latent, t, self.cond_emb, depth64)
                latent = sched.next_step(eps, t, latent)
                all_latent.append(latent)

        uncond = self.uncond_emb.clone()
        uncond_list = []
        latent_cur = all_latent[-1]
        for i in range(S):
            uncond = uncond.clone().detach().requires_grad_(True)
            optimizer = torch.optim.Adam([uncond], lr=1e-2 * (1 - i / 100.))
            latent_prev = all_latent[len(all_latent) - i - 2]
            t = int(sched.timesteps[i])
            with torch.no_grad():
                eps_cond = self._unet_eps(latent_cur, t, self.cond_emb,
                                          depth64)
            for j in range(num_inner_steps):
                eps_u = self._unet_eps(latent_cur, t, uncond, depth64)
                eps = eps_u + gs * (eps_cond - eps_u)
                latent_prev_rec = sched.step(eps, t, latent_cur)
                loss = F.mse_loss(latent_prev_rec, latent_prev)
                optimizer.zero_grad()
                loss.backward()
                optimizer.step()
                if loss.item() < epsilon + i * 2e-5:
                    break
            uncond_list.append(uncond[:1].detach())
            with torch.no_grad():
                eps_u = self._unet_eps(latent_cur, t, uncond, depth64)
                eps = eps_u + gs * (eps_cond - eps_u)
                latent_cur = sched.step(eps, t, latent_cur)
        return torch.stack(uncond_list, dim=0), all_latent[-1], all_latent

    # -- step 1b: recording recon (reference: :155-275) --

    def initial_inference(self, init_latents, depth_disparity, uncond_seq):
        sched = self.sched
        depth64 = self.init_depth(depth_disparity)
        gs = self.conf["guidance_scale"]
        acts1, acts2, acts3 = [], [], []
        latents = init_latents
        with torch.no_grad():
            for t_idx, t in enumerate(sched.timesteps):
                t = int(t)
                _, acts = self._unet_eps_acts(latents, t, self.cond_emb,
                                              depth64)
                acts1.append(acts[0][0])
                acts2.append(acts[1][0])
                acts3.append(acts[2][0])
                lat2 = torch.cat([latents] * 2)
                ctx = torch.cat([uncond_seq[t_idx], self.cond_emb])
                eps = self._unet_eps(lat2, t, ctx, depth64)
                eps_u, eps_c = eps.chunk(2)
                eps = eps_u + gs * (eps_c - eps_u)
                latents = sched.step(eps, t, latents)
        return ([torch.stack(acts1), torch.stack(acts2),
                 torch.stack(acts3)], latents)

    # -- step 3: guided denoising (reference: :291-488) --

    def guided_inference(self, latents, depth_disparity, uncond_seq,
                         acts_orig, correspondences, img_res):
        conf = self.conf
        sched = self.sched
        depth64 = self.init_depth(depth_disparity)
        gs = conf["guidance_scale"]
        pc = oracle_process_correspondences(
            correspondences, img_res=img_res, latent_res=self.latent_res,
            bg_erosion=conf["bg_erosion"])
        weights = OracleWeightSchedule(
            conf["fg_weight"], conf["bg_weight"], conf["guidance_max_step"],
            conf["guidance_schedule_type"])

        for t_idx, t in enumerate(sched.timesteps):
            t = int(t)
            act_size = (acts_orig[2].shape[-2], acts_orig[2].shape[-1])
            latents = latents.detach().requires_grad_(True)
            iteration = 0
            while (iteration < conf["num_optsteps"]
                   and t_idx < conf["guidance_max_step"]):
                _, acts = self._unet_eps_acts(latents, t, self.cond_emb,
                                              depth64)
                fgw, bgw = weights(t_idx, iteration)
                loss = 0.0
                for k in range(3):
                    loss = loss + fgw[k] * oracle_foreground_loss(
                        acts[k][0], acts_orig[k][t_idx], pc,
                        conf["fg_patch_size"], act_size)
                    loss = loss + bgw[k] * oracle_background_loss(
                        acts[k][0], acts_orig[k][t_idx], pc,
                        conf["bg_patch_size"], act_size,
                        conf["bg_loss_type"])
                if isinstance(loss, torch.Tensor):
                    grad = torch.autograd.grad(loss, [latents])[0]
                else:
                    grad = 0.0
                latents = latents - grad * conf["guidance_lr"]
                iteration += 1

            with torch.no_grad():
                lat2 = torch.cat([latents.detach()] * 2)
                ctx = torch.cat([uncond_seq[t_idx], self.cond_emb])
                eps = self._unet_eps(lat2, t, ctx, depth64)
                eps_u, eps_c = eps.chunk(2)
                eps = eps_u + gs * (eps_c - eps_u)
                latents = sched.step(eps, t, latents.detach())
        with torch.no_grad():
            return self.latent2image(latents), latents
