"""diffroll_tpu — a TPU-native framework for piano-roll diffusion.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of sony/DiffRoll
(arXiv 2210.05148): automatic piano transcription, piano-roll inpainting and
unconditional generation, all as a single conditional DDPM over piano rolls
conditioned on log-mel spectrograms with classifier-free guidance.

Design principles (vs the PyTorch-Lightning reference):
  * composition over inheritance: the denoiser network, diffusion schedule,
    sampler and evaluator are separate modules wired by explicit configs
    (the reference fuses them via subclassing, reference
    model/diffwave.py:283, task/diffusion.py:219).
  * everything on-device is traced once: the full T-step reverse diffusion is
    ONE `jax.lax.scan` inside one jit — no per-step host sync (the reference
    syncs 200x per batch, task/diffusion.py:784).
  * classifier-free guidance runs both branches in a single batched forward
    (2B) instead of two sequential model calls (task/diffusion.py:951-952).
  * the mel front-end and per-layer conditioner projections are computed once
    per clip and reused across all sampler steps (the reference recomputes
    the mel spectrogram in every one of the 400 forwards).
  * distribution is a declarative `jax.sharding.Mesh` ('data', 'model') with
    XLA-emitted ICI collectives, exposed in the public API.
"""

__version__ = "0.1.0"
