"""DDIM scheduler numerics vs an independent reference implementation.

The oracle below re-derives the diffusers DDIMScheduler closed forms with
numpy (config as in reference: diffhandles/guided_stable_diffuser.py:31-32)
and the inverter's prev/next steps (reference: stable_null_inverter.py:25-43).
"""

import numpy as np
import jax.numpy as jnp

from diffusionhandles_tpu.scheduler import (
    make_ddim_schedule, ddim_step, ddim_next_step, add_noise)


def _oracle_tables(num_train=1000, beta_start=0.00085, beta_end=0.012):
    betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5, num_train) ** 2
    return np.cumprod(1 - betas)


def test_timesteps_leading_spacing():
    sched = make_ddim_schedule(50)
    assert sched.timesteps[0] == 980
    assert sched.timesteps[-1] == 0
    assert np.all(np.diff(sched.timesteps) == -20)
    sched10 = make_ddim_schedule(10)
    assert list(sched10.timesteps) == [900, 800, 700, 600, 500, 400, 300,
                                       200, 100, 0]


def test_alpha_tables_match_oracle():
    sched = make_ddim_schedule(50)
    ac = _oracle_tables()
    np.testing.assert_allclose(sched.alphas_cumprod, ac, rtol=1e-6)
    np.testing.assert_allclose(sched.alpha_t, ac[sched.timesteps], rtol=1e-6)
    prev_t = sched.timesteps - 20
    expected_prev = np.where(prev_t >= 0, ac[np.clip(prev_t, 0, None)], ac[0])
    np.testing.assert_allclose(sched.alpha_prev, expected_prev, rtol=1e-6)


def test_ddim_step_matches_closed_form():
    sched = make_ddim_schedule(50)
    rng = np.random.RandomState(0)
    sample = rng.randn(1, 8, 8, 4).astype(np.float32)
    eps = rng.randn(1, 8, 8, 4).astype(np.float32)
    ac = _oracle_tables()
    for s in [0, 17, 49]:
        t = sched.timesteps[s]
        a_t = ac[t]
        a_prev = ac[t - 20] if t - 20 >= 0 else ac[0]
        x0 = (sample - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
        expected = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps
        got = np.asarray(ddim_step(sched, jnp.asarray(eps), s,
                                   jnp.asarray(sample)))
        np.testing.assert_allclose(got, expected, rtol=2e-5, atol=1e-6)


def test_next_step_inverts_prev_step():
    """next_step(prev_step(x)) == x when driven by the same eps."""
    sched = make_ddim_schedule(50)
    rng = np.random.RandomState(1)
    x = rng.randn(1, 8, 8, 4).astype(np.float32)
    eps = rng.randn(1, 8, 8, 4).astype(np.float32)
    for s in [0, 10, 48]:
        x_prev = ddim_step(sched, jnp.asarray(eps), s, jnp.asarray(x))
        # The inversion iteration that moves back up across denoising index s
        # is i = S - 1 - s.
        i = sched.num_inference_steps - 1 - s
        x_rec = ddim_next_step(sched, jnp.asarray(eps), i, x_prev)
        np.testing.assert_allclose(np.asarray(x_rec), x, rtol=2e-4, atol=2e-5)


def test_next_step_matches_reference_formula():
    """Oracle from reference: stable_null_inverter.py:35-43."""
    sched = make_ddim_schedule(50)
    ac = _oracle_tables()
    rng = np.random.RandomState(2)
    sample = rng.randn(1, 8, 8, 4).astype(np.float32)
    eps = rng.randn(1, 8, 8, 4).astype(np.float32)
    for i in [0, 25, 49]:
        # reference iterates t = timesteps[S - i - 1]
        next_t = sched.timesteps[sched.num_inference_steps - i - 1]
        cur_t = min(next_t - 20, 999)
        a_cur = ac[cur_t] if cur_t >= 0 else ac[0]
        a_next = ac[next_t]
        x0 = (sample - np.sqrt(1 - a_cur) * eps) / np.sqrt(a_cur)
        expected = np.sqrt(a_next) * x0 + np.sqrt(1 - a_next) * eps
        got = np.asarray(ddim_next_step(sched, jnp.asarray(eps), i,
                                        jnp.asarray(sample)))
        np.testing.assert_allclose(got, expected, rtol=2e-5, atol=1e-6)


def test_add_noise():
    sched = make_ddim_schedule(50)
    ac = _oracle_tables()
    rng = np.random.RandomState(3)
    x = rng.randn(2, 4, 4, 4).astype(np.float32)
    n = rng.randn(2, 4, 4, 4).astype(np.float32)
    got = np.asarray(add_noise(sched, jnp.asarray(x), jnp.asarray(n), 980))
    expected = np.sqrt(ac[980]) * x + np.sqrt(1 - ac[980]) * n
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-7)
