"""Object-peeling foreground remover (remote REST client).

Parity with the reference's object-peeling service
(reference: webapp/webapps/object_peeling_webapp.py:20-79 — an alternative
to LaMa backed by a remote REST inpainting endpoint, ~22 s vs ~2 s,
diffhandles_pipeline_webapp.py:771). The remote protocol here is a simple
JSON POST {img, fg_mask} -> {bg_img}; the class degrades with a clear error
when no endpoint is configured (this environment has no egress).
"""

from __future__ import annotations

import json
import urllib.request
from typing import Optional

import numpy as np

from diffusionhandles_tpu.models.lama import ForegroundRemover
from diffusionhandles_tpu.service.base import decode_payload, encode_payload


class ObjectPeelingRemover(ForegroundRemover):
    def __init__(self, endpoint_url: Optional[str] = None,
                 timeout: float = 120.0):
        self.endpoint_url = endpoint_url
        self.timeout = timeout

    def remove_foreground(self, img: np.ndarray, fg_mask: np.ndarray,
                          dilation: int = 0) -> np.ndarray:
        if self.endpoint_url is None:
            raise RuntimeError(
                "ObjectPeelingRemover needs endpoint_url (remote REST "
                "service); use LamaInpainter for local inpainting")
        if dilation > 0:
            from diffusionhandles_tpu.ops.morphology import \
                binary_dilation_iter
            m = np.asarray(binary_dilation_iter(
                np.asarray(fg_mask).reshape(img.shape[-2:]) > 0.5,
                dilation), np.float32)
            fg_mask = m[None, None]
        body = json.dumps(encode_payload(
            {"img": np.asarray(img, np.float32),
             "fg_mask": np.asarray(fg_mask, np.float32)})).encode()
        req = urllib.request.Request(
            self.endpoint_url, data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            out = decode_payload(json.loads(resp.read()))
        return np.asarray(out["bg_img"], np.float32)
