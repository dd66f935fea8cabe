"""FLOPs / cost estimation via XLA cost analysis.

The reference only has an unused pretty-printer (``train_segmenter.py:
42-47``); here the compiled executable's own cost analysis is surfaced.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax


def cost_analysis(fn: Callable, *example_args) -> Dict[str, float]:
    """Compile ``fn`` and return XLA's cost analysis (flops, bytes, ...)."""
    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older API returns one dict per computation
        ca = ca[0] if ca else {}
    return dict(ca or {})


def pretty_flops(fn: Callable, *example_args) -> str:
    ca = cost_analysis(fn, *example_args)
    flops = ca.get("flops", float("nan"))
    return f"{flops / 1e9:.2f} GFLOPs (bytes accessed: " \
           f"{ca.get('bytes accessed', float('nan')) / 1e6:.1f} MB)"
