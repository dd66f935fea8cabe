"""robseg_tpu — a TPU-native robust semantic-segmentation framework.

A ground-up JAX/Flax/Pallas rebuild of the capabilities of
nmndeep/Robust-Segmentation (ECCV 2024, "Towards Reliable Evaluation and Fast
Training of Robust Semantic Segmentation Models"): the SEA ensemble attack
evaluation protocol and PIR-AT adversarial training, across the UperNet-ConvNeXt,
Segmenter-ViT and PSPNet model families.

Design notes (TPU-first, not a port):
  * channels-last (NHWC) everywhere; logits are (B, H, W, C),
    labels are (B, H, W) int32 with ignore_index = -1.
  * images are float in [0, 1]; normalization is part of the model wrapper.
  * models are pure-functional Flax Linen modules; attacks consume a
    ``logits_fn(x) -> logits`` closure and are compiled to single XLA programs
    (``lax.scan`` / ``lax.while_loop`` over attack steps, input gradients via
    ``jax.value_and_grad`` — one fused fwd+bwd per step).
  * data parallelism is a ``shard_map`` over a named mesh axis with in-program
    ``psum`` collectives (replacing the reference's NCCL DDP).
  * metrics are on-device confusion matrices built from MXU-friendly one-hot
    matmuls (replacing per-class Python loops, reference
    ``semseg/attacker.py:9-52``).
"""

__version__ = "0.1.0"

import os as _os


def _setup_compilation_cache():
    """Persistent XLA compilation cache (set ROBSEG_NO_CACHE=1 to skip).

    TPU compiles through remote tunnels can take minutes; caching makes
    repeat runs (benchmarks, eval sweeps, resumed training) start hot.
    """
    if _os.environ.get("ROBSEG_NO_CACHE"):
        return
    if _os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # CPU AOT cache entries are machine-feature sensitive (SIGILL risk
        # when loaded on a host with different claimed features); the cache
        # only pays off for slow tunnel TPU compiles anyway.
        return
    try:
        import jax
        cache_dir = _os.environ.get(
            "ROBSEG_CACHE_DIR",
            _os.path.expanduser("~/.cache/robseg_tpu_xla"))
        _os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is best-effort
        pass


_setup_compilation_cache()

from robseg_tpu import ops  # noqa: F401
