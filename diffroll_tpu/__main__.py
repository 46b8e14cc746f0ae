"""`python -m diffroll_tpu <command> [preset] key=value ...`

Subcommands mapping 1:1 to the reference entry scripts (SURVEY.md §1 L6):
  train       train_spec_roll / continue_train_single / continue_train_both
              (fine-tune via pretrained_path=, dual-dataset via dual=)
  test        eval entry (full reverse diffusion + frame/note F1)
  sample      transcription / inpainting / generation sampling
  infer       unconditional U-Net inference

Beyond the reference:
  transcribe  arbitrary-length audio -> MIDI (windowed + stitched)
  sweep       w x threshold grid -> json + figure (paper-table harness)
  distill     guided progressive distillation (fewer steps, 1 fwd/step)
  serve       persistent HTTP transcription service (micro-batching)
"""

from __future__ import annotations

import sys

COMMANDS = {}


def _resolve_platform(value, env_platforms):
    """Map the user-facing `platform=` value to a registered jax backend.

    `platform=tpu` means "the hardware TPU this host registers" — which may
    live under a custom PJRT plugin name (e.g. a tunneled chip registered as
    'axon' via JAX_PLATFORMS in sitecustomize). Everything else (cpu, an
    explicit plugin name) passes through verbatim.
    """
    if value == "tpu" and env_platforms and env_platforms != "cpu":
        return env_platforms
    return value


def _dispatch(argv):
    # `platform=cpu|tpu` pins the jax backend before first use (some
    # environments pin JAX_PLATFORMS via sitecustomize, so an env var set
    # by the user would be overridden — the config flag always wins)
    argv = list(argv)
    # persistent XLA compilation cache defaults ON for every entry (full-size
    # compiles over a device tunnel take 5-13 minutes; warm reruns reload in
    # seconds). `compile_cache=<dir>` redirects it, `compile_cache=` (empty)
    # disables it. serve additionally honors serve.compile_cache_dir.
    cache_path = "~/.cache/diffroll_tpu/xla"
    for tok in list(argv):
        if tok.startswith("platform="):
            import os

            import jax

            jax.config.update("jax_platforms", _resolve_platform(
                tok.split("=", 1)[1], os.environ.get("JAX_PLATFORMS", "")))
            argv.remove(tok)
        elif tok.startswith("compile_cache="):
            cache_path = tok.split("=", 1)[1]
            argv.remove(tok)
    if cache_path:
        from .utils.compile_cache import enable as enable_compile_cache

        enable_compile_cache(cache_path)

    from .cli import distill, infer, sample, serve, sweep, test, train, transcribe

    commands = {
        "train": train.main,
        "distill": distill.main,
        "test": test.main,
        "sample": sample.main,
        "infer": infer.main,
        "transcribe": transcribe.main,
        "sweep": sweep.main,
        "serve": serve.main,
    }
    if not argv or argv[0] in ("-h", "--help") or argv[0] not in commands:
        print(__doc__)
        print("commands:", ", ".join(commands))
        return 0 if argv and argv[0] in ("-h", "--help") else 2
    # command return values (states, metrics, paths) are for library/test
    # callers, not exit codes; failures raise
    commands[argv[0]](argv[1:])
    return 0


if __name__ == "__main__":
    sys.exit(_dispatch(sys.argv[1:]))
