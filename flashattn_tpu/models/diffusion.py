"""Diffusion sampling loop (Euler) for end-to-end it/s benchmarking.

The reference's headline numbers are ComfyUI it/s with the Euler sampler
(README.md:104-154); one "it" = one U-Net denoise step. This module provides
that loop: a Karras sigma schedule + Euler integration over
:func:`flashattn_tpu.models.unet.unet_forward`, jit-compiled as a single
``lax.scan`` so the bench measures steady-state device throughput.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from flashattn_tpu.models.unet import UNetConfig, unet_forward


def karras_sigmas(n: int, sigma_min=0.0292, sigma_max=14.6146, rho=7.0):
    ramp = jnp.linspace(0, 1, n)
    min_r, max_r = sigma_min ** (1 / rho), sigma_max ** (1 / rho)
    sigmas = (max_r + ramp * (min_r - max_r)) ** rho
    return jnp.concatenate([sigmas, jnp.zeros((1,))])


def sigma_to_t(sigma):
    """Continuous timestep for the karras-style eps model (log-sigma)."""
    return 0.25 * jnp.log(jnp.maximum(sigma, 1e-10)) * 100.0 + 500.0


@functools.partial(
    jax.jit, static_argnames=("cfg", "steps", "interpret", "shape", "attn_impl")
)
def euler_sample(params, key, context, *, cfg: UNetConfig, shape,
                 steps: int = 20, interpret=None, attn_impl="fused"):
    """Euler sampling: returns the final latent [B, H, W, C].

    eps-prediction model: dx/dσ = (x − denoised)/σ with
    denoised = x − σ·eps(x/√(σ²+1), t(σ)).
    """
    sigmas = karras_sigmas(steps)
    x0 = jax.random.normal(key, shape) * sigmas[0]

    def step_fn(x, i):
        sigma, sigma_next = sigmas[i], sigmas[i + 1]
        c_in = jax.lax.rsqrt(sigma ** 2 + 1.0)
        t = jnp.broadcast_to(sigma_to_t(sigma), (shape[0],))
        eps = unet_forward(params, x * c_in, t, context, cfg,
                           interpret=interpret, attn_impl=attn_impl)
        d = eps  # eps-pred: dx/dsigma
        return x + (sigma_next - sigma) * d, None

    x, _ = jax.lax.scan(step_fn, x0, jnp.arange(steps))
    return x
