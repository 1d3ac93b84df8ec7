"""Lane-safe contractions for batch-last (K-minor) tensors.

TPU layout rule behind this module: `jnp.einsum` lowers shared-axis
contractions to `dot_general` with the shared axis as a BATCH dimension,
and XLA places dot batch dimensions MAJOR in the output layout. For our
batch-last tensors (tiny tensor indices leading, the K = B*(N+1) problem
lane axis trailing) that turns every contraction into a
``[K, 5, 5, ...]{T(8,128)}`` intermediate tiled over two 5-sized minor
dims — a measured 41x padding blowup (1.27 GB for a 31 MB tensor) that
made the order-2 derivative stack OOM a 16 GB chip and run ~100x off
speed-of-light.

:func:`ms` ("mul-sum") evaluates the same einsum spec as broadcast
multiplies followed by a `sum` over the contracted LEADING axes. XLA
fuses the product into the reduction (nothing materializes at the
broadcast shape) and every intermediate keeps K minor, so the op stays a
full-lane VPU loop: measured 5.5x faster than einsum on the worst
(rank-5-output) contraction and flat-memory.

Use `ms` whenever the lane axis appears in MORE THAN ONE operand. Keep
`einsum`/`@` when K appears in exactly one operand (it lowers to a clean
dot with K as a free dimension — e.g. the safe-set MLP GEMMs, which
should hit the MXU).
"""

from __future__ import annotations

import jax.numpy as jnp


def ms(spec: str, *ops):
    """Einsum via broadcast-mul + sum, batch-last.

    `spec` is an einsum string WITHOUT the trailing lane axis (e.g.
    ``"b,bpkx,bqx->pqk"``); every operand either carries the lane axis as
    its last dimension (ndim == len(its spec) + 1) or is a shared
    constant without it. The result carries the lane axis last iff any
    operand did. Repeated indices within one operand are not supported.
    """
    ins, out = spec.split("->")
    ins = ins.split(",")
    letters: list[str] = []
    for s in ins:
        for ch in s:
            if ch not in letters:
                letters.append(ch)
    frame_letters = list(out) + [ch for ch in letters if ch not in out]
    frame = {ch: i for i, ch in enumerate(frame_letters)}
    n = len(frame_letters)
    prod = None
    any_k = False
    for s, op in zip(ins, ops):
        has_k = op.ndim == len(s) + 1
        any_k = any_k or has_k
        order = sorted(range(len(s)), key=lambda ax: frame[s[ax]])
        perm = order + ([len(s)] if has_k else [])
        op2 = jnp.transpose(op, perm)
        sset = {frame[ch] for ch in s}
        idx = tuple(slice(None) if i in sset else None for i in range(n)) \
            + ((slice(None),) if has_k else (None,))
        op2 = op2[idx]
        prod = op2 if prod is None else prod * op2
    if prod is not None and not any_k:
        prod = prod[..., 0]
    sum_axes = tuple(i for i in range(n) if frame_letters[i] not in out)
    return jnp.sum(prod, axis=sum_axes) if sum_axes else prod
