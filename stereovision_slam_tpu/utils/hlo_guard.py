"""Guard against array constants in compiled executables.

The axon TPU runtime executes any program whose optimized HLO embeds a dense
ARRAY constant (>= 2 elements) through a pathological slow path: the program
itself dispatches ~100x slower, and every subsequent dispatch in the process
degrades ~20-30x — one poisoned program ruins the whole session (measured;
see docs/PERFORMANCE.md "array-constant cliff"). Scalar constants (s32[],
f32[1], f32[1,1]) are unaffected.

Array constants sneak in through two doors:
  1. closing over device/numpy arrays instead of passing them as arguments
     (the classic jit footgun — the array is baked into the executable);
  2. XLA constant-folding: an expression whose VALUE is trace-time-known
     (e.g. ``jnp.concatenate([jnp.zeros(n), jnp.ones(n)])``, or library
     internals like the qdwh coefficient tables inside ``jnp.linalg.svd``)
     folds into a dense constant even though the source never wrote one.

This module exposes the audit used by tests/test_no_array_constants.py and
benchmarks/audit_constants.py to keep every program on the SLAM hot path
clean.
"""

from __future__ import annotations

import re

import numpy as np

_CONST_RE = re.compile(r"= (\S+?)\[([0-9,]+)\]\S* constant\(")
_META_RE = re.compile(r'op_name="([^"]*)"')
_SRC_RE = re.compile(r'source_file="([^"]*)".*?source_line=(\d+)')


def array_constants(compiled_or_text, min_elements: int = 2):
    """List (dtype, shape, op_name, source) for every array constant with at
    least `min_elements` elements in a compiled executable's optimized HLO.

    Accepts a ``jax.stages.Compiled`` (from ``jit(f).lower(...).compile()``)
    or the ``as_text()`` string directly.
    """
    txt = compiled_or_text if isinstance(compiled_or_text, str) else (
        compiled_or_text.as_text())
    out = []
    for line in txt.splitlines():
        m = _CONST_RE.search(line)
        if not m:
            continue
        dims = [int(x) for x in m.group(2).split(",") if x]
        n = int(np.prod(dims)) if dims else 1
        if n < min_elements:
            continue
        meta = _META_RE.search(line)
        src = _SRC_RE.search(line)
        out.append((
            m.group(1),
            m.group(2),
            meta.group(1) if meta else "",
            f"{src.group(1)}:{src.group(2)}" if src else "",
        ))
    return out


def assert_no_array_constants(compiled_or_text, what: str = "program",
                              min_elements: int = 2) -> None:
    """Raise AssertionError listing offenders if the executable embeds any
    array constant with >= min_elements elements."""
    offenders = array_constants(compiled_or_text, min_elements=min_elements)
    if offenders:
        lines = "\n".join(f"  {dt}[{sh}] {op} {src}"
                          for dt, sh, op, src in offenders)
        raise AssertionError(
            f"{what} embeds {len(offenders)} array constant(s) — these make "
            f"the axon TPU runtime degrade every dispatch "
            f"(docs/PERFORMANCE.md):\n{lines}")
