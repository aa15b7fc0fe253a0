"""Scoped matmul precision for accuracy-critical device programs.

TPU dot/conv ops default to bf16-input passes.  That is the right call for
the image front-end (pixel-level math, robust gating), but the estimator's
GN/Cholesky/preintegration chains accumulate over hundreds of frames and
demonstrably diverge at bf16 dot precision (30 s proxy: 31 %-of-path ATE at
default precision vs 0.5 % at f32 dots — RESULTS.md).  Rather than forcing
the whole process to 3-pass f32 (which costs the front-end ~60 % extra),
each solver-side program builder wraps its callable so TRACING happens under
`jax.default_matmul_precision("highest")` — the precision is captured in the
jaxpr once and applies wherever the program runs.
"""
from __future__ import annotations

import functools

import jax


def highest_matmul_precision(fn):
    """Wrap a (possibly jitted) callable so every trace of its body sees
    default_matmul_precision('highest')."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
