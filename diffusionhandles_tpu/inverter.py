"""Null-text inversion (TPU-native).

Re-designs the reference's StableNullInverter
(reference: diffhandles/stable_null_inverter.py):

* `ddim_loop` (reference :112-122) is a `lax.scan` of forward-noising steps
  driven by cond-only eps predictions.
* `null_optimization` (reference :135-167) is a scan over the 50 timesteps;
  the per-timestep Adam loop over the uncond embedding (fresh optimizer,
  lr = 1e-2*(1 - i/100), up to num_inner_steps iterations with the
  loss < epsilon + i*2e-5 early stop) becomes a `lax.while_loop` whose body
  is one fused U-Net fwd+bwd via jax.value_and_grad — the data-dependent
  early stop stays on device. (A masked fixed-trip `scan` variant is
  value-identical and selectable via config.null_opt_inner_loop.)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diffusionhandles_tpu.diffuser import (ACT_DTYPES,
                                           GuidedStableDiffuser)
from diffusionhandles_tpu.models.unet import \
    maybe_prepare_unet_params
from diffusionhandles_tpu.scheduler import ddim_next_step, ddim_step
from diffusionhandles_tpu.utils.aot import AotStore


class NullInverter:
    """Abstract inverter (reference: diffhandles/null_inverter.py)."""

    def __init__(self, model):
        self.model = model

    def invert(self, target_img, depth, prompt, **kwargs):
        raise NotImplementedError


class StableNullInverter(NullInverter):

    def __init__(self, model: GuidedStableDiffuser,
                 num_ddim_steps: Optional[int] = None,
                 guidance_scale: float = 7.5):
        super().__init__(model)
        self.num_ddim_steps = (num_ddim_steps
                               or model.schedule.num_inference_steps)
        if self.num_ddim_steps != model.schedule.num_inference_steps:
            # the ddim loop indexes timesteps with num_ddim_steps while
            # ddim_next_step/ddim_step index alphas with the schedule's own
            # length — a mismatch silently pairs every eps with the wrong
            # alpha; rebuild the diffuser's schedule instead
            raise ValueError(
                f"num_ddim_steps={self.num_ddim_steps} must equal the "
                f"model schedule's num_inference_steps="
                f"{model.schedule.num_inference_steps} (configure "
                f"GuidedDiffuserConfig.num_timesteps)")
        self.guidance_scale = guidance_scale
        self._jit_cache = {}

    # ------------------------------------------------------------------
    # AOT program names (shared with the pipeline facade's prefetch order
    # and cold-start routing — see diffuser.py's name helpers).

    def ddim_loop_program_name(self) -> str:
        return (f"ddim_loop:{self.num_ddim_steps}:{self.model.conf.dtype}:"
                f"{self.model.conv_mode_tag}")

    def null_opt_program_name(self, num_inner_steps: int = 5,
                              record: bool = True,
                              inner_loop: Optional[str] = None) -> str:
        if inner_loop is None:
            inner_loop = getattr(self.model.conf, "null_opt_inner_loop",
                                 "while")
        name = (f"null_opt:{self.num_ddim_steps}:{num_inner_steps}:"
                f"{self.guidance_scale}:{self.model.conf.dtype}:"
                f"{inner_loop}:{self.model.conv_mode_tag}")
        if record:
            name += f":rec:{self.model.conf.activation_store_dtype}"
        return name

    # ------------------------------------------------------------------

    def _build_ddim_loop(self):
        model = self.model
        unet = model.unet_fast
        schedule = model.schedule
        timesteps = jnp.asarray(schedule.timesteps, jnp.int32)
        S = self.num_ddim_steps

        def run(unet_params, latent0, depth64, cond_emb):
            unet_params = maybe_prepare_unet_params(unet_params)
            def step(latent, i):
                # reference iterates t = timesteps[S - i - 1]
                # (stable_null_inverter.py:118).
                t = timesteps[S - 1 - i]
                model_in = model._unet_in(latent, depth64)
                eps, _, _ = unet.apply(unet_params, model_in, t, cond_emb)
                nxt = ddim_next_step(schedule, eps, i, latent)
                return nxt, nxt

            final, traj = jax.lax.scan(step, latent0, jnp.arange(S))
            # all_latent = [x0] + 50 noised latents (reference :114-121).
            return jnp.concatenate([latent0[None], traj], axis=0)

        return AotStore.default().wrap(self.ddim_loop_program_name(), run)

    def _build_null_optimization(self, num_inner_steps: int,
                                 inner_loop: str = "while",
                                 record: bool = False):
        model = self.model
        act_dtype = ACT_DTYPES[model.conf.activation_store_dtype]
        # both paths use flash attention + taps convs (best measured fwd
        # AND bwd since the round-4 batch-2 A/B; see diffuser.__init__)
        unet = model.models.unet
        unet_fast = model.unet_fast
        schedule = model.schedule
        timesteps = jnp.asarray(schedule.timesteps, jnp.int32)
        gs = self.guidance_scale
        S = self.num_ddim_steps

        def uncond_eps(unet_params, latent, depth64, uncond, step_idx):
            model_in = model._unet_in(latent, depth64)
            eps, _, _ = unet.apply(unet_params, model_in,
                                   timesteps[step_idx], uncond)
            return eps

        def uncond_eps_fast(unet_params, latent, depth64, uncond, step_idx):
            model_in = model._unet_in(latent, depth64)
            eps, _, _ = unet_fast.apply(unet_params, model_in,
                                        timesteps[step_idx], uncond)
            return eps

        def eps_to_loss(eps_u, eps_cond, latent_cur, latent_prev, step_idx):
            """MSE as a function of the uncond eps prediction
            (reference: stable_null_inverter.py:152-156)."""
            eps = eps_u + gs * (eps_cond - eps_u)
            latent_prev_rec = ddim_step(schedule, eps, step_idx, latent_cur)
            return jnp.mean((latent_prev_rec - latent_prev) ** 2)

        def mse_loss(uncond, unet_params, latent_cur, depth64, eps_cond,
                     latent_prev, step_idx):
            eps_u = uncond_eps(unet_params, latent_cur, depth64, uncond,
                               step_idx)
            return eps_to_loss(eps_u, eps_cond, latent_cur, latent_prev,
                               step_idx)

        loss_and_grad = jax.value_and_grad(mse_loss)

        def run(unet_params, latents_traj, depth64, uncond0, cond_emb,
                epsilon):
            unet_params = maybe_prepare_unet_params(unet_params)
            # latents_traj: [S+1, 1, h, w, 4] from ddim_loop.
            # Per-step target: latent_prev = latents[S - 1 - i]
            # (reference :144: latents[len(latents) - i - 2]).
            latent_prev_seq = latents_traj[S - 1::-1]

            def outer_step(carry, xs):
                latent_cur, uncond = carry
                step_idx, latent_prev = xs
                lr = 1e-2 * (1.0 - step_idx.astype(jnp.float32) / 100.0)
                thresh = epsilon + step_idx.astype(jnp.float32) * 2e-5

                eps_cond, cond_acts, _ = unet_fast.apply(
                    unet_params, model._unet_in(latent_cur, depth64),
                    timesteps[step_idx], cond_emb)
                # Conditional-row activations depend only on
                # (latent_cur, t, cond) — never on the uncond embedding —
                # and latent_cur rolls forward on exactly the recording
                # reconstruction's CFG trajectory, so this capture equals
                # the separate recording scan's
                # (diffuser._build_initial_inference cond row; reference's
                # batch-1 cond pass, guided_stable_diffuser.py:222-240).
                recorded = (tuple(a[0].astype(act_dtype) for a in cond_acts)
                            if record else ())

                # Fresh Adam per timestep (reference :143).
                tx = optax.adam(1.0)  # lr applied via scaling below
                opt_state0 = tx.init(uncond)
                init = (jnp.int32(0), jnp.float32(jnp.inf), uncond,
                        opt_state0)

                if inner_loop == "scan":
                    # Masked fixed-trip scan: identical VALUES to the
                    # while_loop (post-early-stop iterations are masked to
                    # no-ops), but no data-dependent control flow — XLA
                    # schedules the fixed loop better (measured on the
                    # --nullopt/--nulloptscan microbench pair). The
                    # while_loop stays available: with real checkpoints the
                    # published early stop skips most iterations, which
                    # only data-dependent control flow can exploit.
                    def scan_body(state, _):
                        j, last_loss, u, opt_state = state
                        live = jnp.logical_or(j == jnp.int32(0),
                                              last_loss >= thresh)
                        loss, g = loss_and_grad(u, unet_params, latent_cur,
                                                depth64, eps_cond,
                                                latent_prev, step_idx)
                        updates, opt2 = tx.update(g, opt_state, u)
                        u2 = optax.apply_updates(
                            u, jax.tree.map(lambda x: lr * x, updates))
                        pick = lambda a, b: jnp.where(live, a, b)
                        u = jax.tree.map(pick, u2, u)
                        opt_state = jax.tree.map(pick, opt2, opt_state)
                        last_loss = jnp.where(live, loss, last_loss)
                        return (j + 1, last_loss, u, opt_state), None
                    (_, _, uncond, _), _ = jax.lax.scan(
                        scan_body, init, None, length=num_inner_steps)
                    # CFG prev-step with the optimized uncond
                    # (reference :163-165).
                    eps_u = uncond_eps_fast(unet_params, latent_cur,
                                            depth64, uncond, step_idx)
                else:
                    # Fused fwd+bwd while body (value_and_grad) + a separate
                    # post-loop uncond forward. A round-5 restructure tried
                    # jax.vjp with the backward under a lax.cond (the loop's
                    # trailing no-step forward doubling as the post-loop
                    # uncond eps) to drop one U-Net code instance from the
                    # serialized executable: it saved 115 MB (1016->902) but
                    # cost +2.1 s warm step1 (8.30 vs 6.18 s measured,
                    # scripts/probe_nullopt.py) — the vjp tape crossing the
                    # cond boundary defeats XLA's fwd+bwd fusion. Reverted:
                    # warm latency is the headline; the cold-start bytes are
                    # attacked at the conv-mode level instead
                    # (PERFORMANCE.md "Cold start").
                    def cond_fn(state):
                        j, last_loss, _, _ = state
                        return jnp.logical_and(
                            j < num_inner_steps,
                            jnp.logical_or(j == 0, last_loss >= thresh))

                    def body_fn(state):
                        j, _, u, opt_state = state
                        loss, g = loss_and_grad(u, unet_params, latent_cur,
                                                depth64, eps_cond,
                                                latent_prev, step_idx)
                        updates, opt_state = tx.update(g, opt_state, u)
                        u = optax.apply_updates(
                            u, jax.tree.map(lambda x: lr * x, updates))
                        return j + 1, loss, u, opt_state

                    _, _, uncond, _ = jax.lax.while_loop(
                        cond_fn, body_fn, init)
                    eps_u = uncond_eps_fast(unet_params, latent_cur,
                                            depth64, uncond, step_idx)
                eps = eps_u + gs * (eps_cond - eps_u)
                latent_cur = ddim_step(schedule, eps, step_idx, latent_cur)
                return (latent_cur, uncond), (uncond, recorded)

            (final_latent, _), (uncond_seq, acts) = jax.lax.scan(
                outer_step, (latents_traj[S], uncond0),
                (jnp.arange(S), latent_prev_seq))
            if record:
                # uncond_seq [S, 1, 77, D]; acts: 3x [S, H, W, C] stacks;
                # final_latent: the recording recon's final latents.
                return uncond_seq, acts, final_latent
            return uncond_seq  # [S, 1, 77, D]

        return AotStore.default().wrap(
            self.null_opt_program_name(num_inner_steps, record=record,
                                       inner_loop=inner_loop), run)

    # ------------------------------------------------------------------

    def invert(self, target_img, depth, prompt: str,
               num_inner_steps: int = 10, early_stop_epsilon: float = 1e-5,
               verbose: bool = False, record_activations: bool = False,
               return_recon: bool = True):
        """Invert an image to (init noise, per-step null embeddings).

        Args:
          target_img: [1, H, W, 3] in [0, 1] (NHWC).
          depth: disparity map (any of [H,W] / [1,1,H,W] layouts).
          record_activations: additionally capture the guidance activation
            stacks + final latents of the recording reconstruction from the
            inversion's own conditional passes (see config.fused_recording)
            and return them as a fourth element (acts list, final_latents).

        Returns ((target_img, recon_img), init_noise_latent, uncond_seq)
        matching the reference's invert() contract
        (stable_null_inverter.py:169-181), plus the recording when
        `record_activations`.
        """
        model = self.model
        depth64 = model.init_depth(depth) if model.conf.use_depth else None
        uncond, cond = model.init_prompt(prompt)

        latent0 = model.encode_latent_image(jnp.asarray(target_img))
        # the VAE-recon preview is part of the reference contract but the
        # pipeline facade discards it — return_recon=False skips the full
        # VAE decode on the hot path
        recon_img = (model.decode_latent_image(latent0) if return_recon
                     else None)

        if "ddim_loop" not in self._jit_cache:
            self._jit_cache["ddim_loop"] = self._build_ddim_loop()
        traj = self._jit_cache["ddim_loop"](
            model.models.unet_params, latent0, depth64, cond)

        inner_loop = getattr(model.conf, "null_opt_inner_loop", "while")
        key = ("null_opt", num_inner_steps, inner_loop, record_activations)
        if key not in self._jit_cache:
            self._jit_cache[key] = self._build_null_optimization(
                num_inner_steps, inner_loop, record=record_activations)
        out = self._jit_cache[key](
            model.models.unet_params, traj, depth64, uncond, cond,
            jnp.float32(early_stop_epsilon))

        init_noise = traj[self.num_ddim_steps]
        if record_activations:
            uncond_seq, acts, final_latents = out
            return ((target_img, recon_img), init_noise, uncond_seq,
                    (list(acts), final_latents))
        return (target_img, recon_img), init_noise, out
