"""Text-prompted foreground segmentation.

Fills the role of the reference's LangSAM dependency (GroundingDINO + SAM
accessed as an external model, reference: test/estimate_foreground.py:11-42
and webapp/webapps/langsam_segmenter_webapp.py).

In-repo implementation: an open-vocabulary CLIP similarity segmenter — the
CLIP image encoder's patch tokens are scored against the text prompt's
embedding, the similarity map is upsampled, thresholded adaptively, and
cleaned with morphology. This is a self-contained TPU-native stand-in with
the same service interface; a SAM-class promptable mask decoder can be slot
in behind the same `ForegroundSelector` interface when its weights are
available.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffusionhandles_tpu.models.clip_image import (CLIPImageConfig,
                                                    CLIPImageEncoder,
                                                    tiny_clip_image_config)
from diffusionhandles_tpu.models.clip_text import (CLIPTextConfig,
                                                   CLIPTextEncoder,
                                                   tiny_clip_config)
from diffusionhandles_tpu.models.tokenizer import load_tokenizer
from diffusionhandles_tpu.ops.morphology import (close, ellipse_kernel,
                                                 open_)
from diffusionhandles_tpu.ops.resize import resize_nhwc


class ForegroundSelector:
    """Service-level interface (parity with webapp/webapps/
    foreground_selector_webapp.py)."""

    def select_foreground(self, img: np.ndarray,
                          prompt: str) -> np.ndarray:
        """img [1,3,H,W] in [0,1] + text prompt -> mask [1,1,H,W]."""
        raise NotImplementedError


class CLIPSegmenter(ForegroundSelector):
    def __init__(self, image_config: Optional[CLIPImageConfig] = None,
                 text_config: Optional[CLIPTextConfig] = None,
                 image_params=None, text_params=None, seed: int = 0,
                 checkpoint_dir: Optional[str] = None,
                 clip_checkpoint: Optional[str] = None,
                 text_projection=None):
        """With `clip_checkpoint` (a released HF CLIPModel weight file),
        loads real vision+text towers and uses CLIP's eot-pooled projected
        text embedding; otherwise seeded-random tiny towers with mean
        pooling (CI mode)."""
        if clip_checkpoint is not None and image_config is None:
            from diffusionhandles_tpu.models.weights_clip import (
                clip_vit_b16, load_clip_checkpoint)
            image_config, text_config = clip_vit_b16()
            image_params, text_params, text_projection = \
                load_clip_checkpoint(clip_checkpoint, image_config,
                                     text_config)
        self.image_config = image_config or tiny_clip_image_config(
            image_size=224, patch_size=16, hidden_size=256, num_layers=6,
            num_heads=4, projection_dim=256)
        self.text_config = text_config or tiny_clip_config(
            vocab_size=49408, hidden_size=256, intermediate_size=512,
            num_heads=4, num_layers=4)
        self.text_projection = (None if text_projection is None
                                else jnp.asarray(text_projection))
        if self.image_config.projection_dim != self.text_config.hidden_size:
            raise ValueError("image projection_dim must match text hidden")
        self.image_model = CLIPImageEncoder(self.image_config)
        self.text_model = CLIPTextEncoder(self.text_config)
        key = jax.random.PRNGKey(seed)
        if image_params is None:
            image_params = jax.jit(self.image_model.init)(
                key, jnp.zeros((1, 32, 32, 3)))
        if text_params is None:
            text_params = jax.jit(self.text_model.init)(
                jax.random.PRNGKey(seed + 1), jnp.zeros((1, 77), jnp.int32))
        self.image_params = image_params
        self.text_params = text_params
        self.tokenizer = load_tokenizer(
            checkpoint_dir, vocab_size=self.text_config.vocab_size)
        self._encode_image = jax.jit(self.image_model.apply)
        self._encode_text = jax.jit(self.text_model.apply)

    def similarity_map(self, img: np.ndarray, prompt: str) -> np.ndarray:
        """Dense cosine similarity between patch tokens and the prompt."""
        x = jnp.asarray(np.moveaxis(np.asarray(img, np.float32), -3, -1))
        _, patches = self._encode_image(self.image_params, x)
        ids = jnp.asarray(self.tokenizer([prompt]), jnp.int32)
        text = self._encode_text(self.text_params, ids)
        if self.text_projection is not None:
            # CLIP pooling: the (post final-LN) hidden state at the eot
            # token (highest token id), through the text projection
            eot = jnp.argmax(ids, axis=-1)
            t = text[jnp.arange(text.shape[0]), eot] @ self.text_projection
        else:
            # random-weight CI mode: mean over positions
            t = text.mean(axis=1)
        patches = patches / (jnp.linalg.norm(patches, axis=-1,
                                             keepdims=True) + 1e-8)
        t = t / (jnp.linalg.norm(t, axis=-1, keepdims=True) + 1e-8)
        sim = jnp.einsum("bhwc,bc->bhw", patches, t)
        h, w = img.shape[-2:]
        sim = resize_nhwc(sim[..., None], (h, w), "bilinear")[..., 0]
        return np.asarray(sim)

    def propose_box(self, img: np.ndarray, prompt: str) -> np.ndarray:
        """Text-grounded box proposal [x1, y1, x2, y2]: bbox of the
        thresholded similarity region (the role GroundingDINO's box plays
        in LangSAM, reference: test/estimate_foreground.py:37-39)."""
        sim = self.similarity_map(img, prompt)[0]
        lo, hi = np.percentile(sim, [5, 95])
        mask = sim > (lo + hi) / 2
        if not mask.any():
            fy, fx = np.unravel_index(np.argmax(sim), sim.shape)
            return np.array([fx - 4, fy - 4, fx + 4, fy + 4], np.float32)
        ys, xs = np.nonzero(mask)
        return np.array([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1],
                        np.float32)

    def select_foreground(self, img: np.ndarray, prompt: str,
                          refine_with=None) -> np.ndarray:
        """Text-prompted mask. With `refine_with` (a PromptableSegmenter),
        runs the two-stage LangSAM-style pipeline: CLIP grounding proposes
        a box (plus the similarity-peak point), SAM produces the final
        mask — the reference's grounding->SAM handoff is box-prompted
        (LangSAM predicts from GroundingDINO boxes)."""
        sim = self.similarity_map(img, prompt)[0]
        if refine_with is not None:
            box = self.propose_box(img, prompt)
            fy, fx = np.unravel_index(np.argmax(sim), sim.shape)
            mask, _ = refine_with.predict(
                img, points=[[int(fx), int(fy)]], labels=[1],
                boxes=box)
            return mask
        # adaptive threshold: Otsu-style split on the similarity histogram
        lo, hi = np.percentile(sim, [5, 95])
        thresh = (lo + hi) / 2
        mask = sim > thresh
        res = mask.shape[-1]
        k = ellipse_kernel(max(1, res // 50))
        mask = np.asarray(open_(close(mask, k), k))
        return mask.astype(np.float32)[None, None]


class LangSamSegmenter(ForegroundSelector):
    """The LangSAM-parity two-stage pipeline: text grounding proposes
    prompts, SAM produces the mask (reference: test/estimate_foreground.py:
    18-40 — GroundingDINO boxes -> SAM; here CLIP-similarity peaks -> the
    published SAM graph, models/sam.py). Pass `sam_checkpoint` to load
    released sam_vit_* weights."""

    def __init__(self, clip_segmenter: Optional[CLIPSegmenter] = None,
                 sam=None, sam_config=None,
                 sam_checkpoint: Optional[str] = None,
                 grounder=None,
                 gdino_checkpoint: Optional[str] = None,
                 bert_vocab_path: Optional[str] = None):
        """Grounding stage: a GroundingDINO grounder when `grounder` /
        `gdino_checkpoint` is given (the reference's exact LangSAM stack),
        else CLIP-similarity grounding."""
        from diffusionhandles_tpu.models.sam import (PromptableSegmenter,
                                                     sam_vit_h)
        if gdino_checkpoint is not None and grounder is None:
            from diffusionhandles_tpu.models.groundingdino import (
                GroundingDinoGrounder)
            grounder = GroundingDinoGrounder(
                checkpoint_path=gdino_checkpoint,
                vocab_path=bert_vocab_path)
        self.grounder = grounder
        self.grounding = clip_segmenter or (
            None if grounder is not None else CLIPSegmenter())
        if sam is None:
            if sam_checkpoint is not None and sam_config is None:
                sam_config = sam_vit_h()
            sam = PromptableSegmenter(config=sam_config,
                                      checkpoint_path=sam_checkpoint)
        self.sam = sam

    def select_foreground(self, img: np.ndarray, prompt: str) -> np.ndarray:
        if self.grounder is not None:
            box = self.grounder.best_box(img, prompt)
            mask, _ = self.sam.predict(img, boxes=box)
            return mask
        return self.grounding.select_foreground(img, prompt,
                                                refine_with=self.sam)
