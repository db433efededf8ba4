"""Shared helpers for the torch-autograd gradient A/B tests.

Comparison metric: per-leaf max|a-b| is normalized two ways —
  * against the LEAF's own max|grad| (strict, but meaningless for leaves
    whose true gradient is ~0 by an invariance: e.g. the reference
    SelfAttention softmaxes over the query axis (models/fusion_nets.py:
    105-106), so a constant query-bias shift cancels exactly and
    dL/d(query_proj.bias) == 0 analytically — both frameworks produce
    ~1e-9 autograd noise there, and noise/noise is unbounded);
  * against the MODULE's max|grad| (the scale that matters for training).
The strict leaf-relative bound applies only to leaves carrying >=1% of the
module's gradient scale; every leaf must meet the module-relative bound.
"""

from __future__ import annotations

import numpy as np

import jax

# fp32 end-to-end; the two frameworks order the same reductions differently.
# Module-relative bound (the training-relevant scale) is the strict one; the
# per-leaf bound is looser because small-scale leaves sit downstream of
# softmax/BN chains where fp32 reassociation noise is amplified relative to
# the leaf's own magnitude (measured: IMIM attention kernels ~2.7e-3 leaf-rel
# while 3.3e-5 module-rel).
REL_TOL = 5e-4
LEAF_REL_TOL = 5e-3


def grad_sd(m):
    """state_dict-shaped dict of torch gradients (buffers pass through as
    values so converters' stat lookups succeed; converted stats are
    ignored by the comparisons)."""
    out = {}
    params = dict(m.named_parameters())
    for k, v in m.state_dict().items():
        p = params.get(k)
        if p is not None:
            out[k] = (np.zeros(tuple(p.shape), np.float32)
                      if p.grad is None else np.asarray(p.grad.numpy()))
        else:
            out[k] = np.asarray(v.detach().numpy())
    return out


def collect_deltas(ours, theirs, prefix, out):
    """out[name] = (max|a-b|, max|b|) over matching tree paths."""
    flat_o = jax.tree_util.tree_flatten_with_path(ours)[0]
    flat_t = jax.tree_util.tree_flatten_with_path(theirs)[0]
    tdict = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat_t}
    for k, v in flat_o:
        name = jax.tree_util.keystr(k)
        assert name in tdict, f"missing converted grad for {prefix}{name}"
        a = np.asarray(v, np.float64)
        b = np.asarray(tdict[name], np.float64)
        assert a.shape == b.shape, (prefix + name, a.shape, b.shape)
        out[prefix + name] = (float(np.abs(a - b).max()),
                              float(np.abs(b).max()))
    return out


def assert_and_report(deltas, label, rel_tol: float = REL_TOL) -> float:
    """Apply the two-scale criterion; print the committed summary line.
    Returns the max module-relative delta (the PARITY_REPORT number)."""
    by_module: dict = {}
    for name, (delta, scale) in deltas.items():
        mod = name.split(":", 1)[0]
        by_module.setdefault(mod, []).append((name, delta, scale))
    worst_mod_rel = 0.0
    failures = []
    rows = []
    for mod, entries in sorted(by_module.items()):
        mod_scale = max(max(s for _, _, s in entries), 1e-12)
        for name, delta, scale in entries:
            mod_rel = delta / mod_scale
            worst_mod_rel = max(worst_mod_rel, mod_rel)
            rows.append((mod_rel, delta / max(scale, 1e-12), name))
            if mod_rel > rel_tol:
                failures.append((name, "module-rel", mod_rel))
            if scale >= 0.01 * mod_scale and delta / scale > LEAF_REL_TOL:
                failures.append((name, "leaf-rel", delta / scale))
    rows.sort(reverse=True)
    print(f"\n[{label}] max_module_rel_grad_delta = {worst_mod_rel:.3e} "
          f"over {len(deltas)} leaves; worst (module-rel, leaf-rel, leaf):")
    for mod_rel, leaf_rel, name in rows[:8]:
        print(f"  {mod_rel:.3e}  {leaf_rel:.3e}  {name}")
    assert not failures, failures
    return worst_mod_rel
