"""Fused (flattened per-group) optimizer == multi_transform, value-for-value.

The fused path (engine/optim.make_partitioned_flat_tx) exists purely for TPU
step-time (the per-leaf Adam chain is ~2k tiny ops in the profiled stage-1
step); Adam/SGD updates are elementwise so flattening must not change any
value beyond fp-order noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from text_guided_face_recognition_tpu.config import TGFRConfig
from text_guided_face_recognition_tpu.engine import optim


def _tree(seed=0):
    k = jax.random.split(jax.random.PRNGKey(seed), 8)
    return {
        "image_head": {"proj": {"kernel": jax.random.normal(k[0], (16, 8)),
                                "bias": jnp.zeros((8,))}},
        "text_encoder": {"l0": {"w": jax.random.normal(k[1], (8, 8))},
                         "l1": {"w": jax.random.normal(k[2], (8, 4))}},
        "text_head": {"w": jax.random.normal(k[3], (4, 4))},
        "image_cls": {"weight": jax.random.normal(k[4], (10, 8))},
        "text_cls": {"weight": jax.random.normal(k[5], (10, 8))},
    }


def _run_steps(tx, params, n=3, lr_groups=("head", "encoder", "cls")):
    state = tx.init(params)
    for g in lr_groups:
        state = optim.set_lr(state, g, 0.01 * (1 + hash(g) % 3))
    for i in range(n):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.sin(p + 0.1 * i) * 0.05, params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    return params, state


@pytest.mark.parametrize("maker", [optim.make_stage1_bert_tx,
                                   optim.make_stage1_lstm_tx])
def test_fused_matches_multi_transform_stage1(maker):
    params = _tree()
    base = TGFRConfig().replace(weight_decay=0.02)
    p_ref, _ = _run_steps(maker(base), params)
    p_fused, st = _run_steps(maker(base.replace(fused_optimizer=True)), params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        p_ref, p_fused)
    # fused state round-trips LR edits
    assert abs(optim.get_lr(st, "head") - 0.01 * (1 + hash("head") % 3)) < 1e-9


def test_fused_matches_multi_transform_stage2():
    params = {
        "text_encoder": {"l0": {"w": jnp.ones((4, 4)) * 0.3}},
        "text_head": {"w": jnp.ones((4, 2)) * 0.2},
        "image_head": {"w": jnp.ones((2, 2)) * 0.1},
        "fusion_net": {"w": jnp.ones((2, 2)) * 0.5},
        "metric_fc": {"weight": jnp.ones((6, 2))},
    }
    base = TGFRConfig().replace(weight_decay=0.01)
    p_ref, _ = _run_steps(optim.make_stage2_tx(base), params)
    p_fused, _ = _run_steps(optim.make_stage2_tx(
        base.replace(fused_optimizer=True)), params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        p_ref, p_fused)


def test_fused_frozen_text_group_stays_frozen():
    params = _tree()
    args = TGFRConfig().replace(compat_frozen_text=True, fused_optimizer=True)
    tx = optim.make_stage1_bert_tx(args)
    state = tx.init(params)
    state = optim.set_lr(state, "encoder", 99.0)  # must no-op, not crash
    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p), params)
    updates, _ = tx.update(grads, state, params)
    for leaf in jax.tree_util.tree_leaves(updates["text_encoder"]):
        np.testing.assert_array_equal(np.asarray(leaf), 0.0)


def test_encoder_clip_lives_in_tx_chain():
    """The reference clips ONLY text_encoder grads by clip_max_norm
    (src/train_encoders_bert.py:329-331); the clip now rides the encoder
    group's optimizer chain. With lr=1 and plain-SGD-like comparison we
    check the clip scales a large encoder grad and leaves heads alone."""
    params = _tree()
    args = TGFRConfig().replace(clip_max_norm=1.0, apply_grad_clip=True,
                            weight_decay=0.0)
    for fused in (False, True):
        tx = optim.make_stage1_bert_tx(args.replace(fused_optimizer=fused))
        state = tx.init(params)
        state = optim.set_lr(state, "encoder", 1.0)
        state = optim.set_lr(state, "head", 1.0)
        big = jax.tree_util.tree_map(jnp.zeros_like, params)
        big["text_encoder"] = jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, 100.0), params["text_encoder"])
        big["image_head"] = jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, 3.0), params["image_head"])
        u1, _ = tx.update(big, state, params)
        # Adam normalizes magnitudes, so compare against the UNclipped run
        # via a clip_max_norm large enough to be inactive
        tx2 = optim.make_stage1_bert_tx(
            args.replace(fused_optimizer=fused, clip_max_norm=1e9))  # clip still on
        st2 = tx2.init(params)
        st2 = optim.set_lr(st2, "encoder", 1.0)
        st2 = optim.set_lr(st2, "head", 1.0)
        u2, _ = tx2.update(big, st2, params)
        # the clip must leave non-encoder groups untouched
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_allclose(np.asarray(x),
                                                    np.asarray(y), rtol=1e-6),
            u1["image_head"], u2["image_head"])
        a = np.asarray(u1["text_encoder"]["l0"]["w"])
        b = np.asarray(u2["text_encoder"]["l0"]["w"])
        # first-step Adam is scale-invariant: clipped == unclipped on step 1
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)
        # second step differentiates
        g2 = jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, 50.0), params["text_encoder"])
        big2 = dict(big)
        big2["text_encoder"] = g2
        _, stA = tx.update(big, tx.init(params), params)
        stA = optim.set_lr(stA, "encoder", 1.0)
        uA, _ = tx.update(big2, stA, params)
        _, stB = tx2.update(big, tx2.init(params), params)
        stB = optim.set_lr(stB, "encoder", 1.0)
        uB, _ = tx2.update(big2, stB, params)
        assert not np.allclose(np.asarray(uA["text_encoder"]["l0"]["w"]),
                               np.asarray(uB["text_encoder"]["l0"]["w"]))


def test_prng_impl_config_controls_dropout_keys():
    """prng_impl selects the dropout-mask PRNG (default rbg — DEVIATIONS
    #18); param init stays threefry regardless. Checked at the key level
    (trainer construction is exercised by the engine tests)."""
    for impl in ("rbg", "threefry2x32"):
        k = jax.random.key(0, impl=impl)
        assert impl in str(jax.random.key_impl(k))
        k1, k2 = jax.random.split(k)
        assert str(jax.random.key_impl(k1)) == str(jax.random.key_impl(k))
        assert float(jax.random.uniform(k1, ())) != float(
            jax.random.uniform(k2, ()))
    assert TGFRConfig().prng_impl == "rbg"


def test_stacked_matches_multi_transform_stage1():
    """Shape-bucket stacked updates (r3 remedy) == multi_transform, value for
    value: stacking same-shape leaves is a no-op for elementwise Adam/SGD, and
    the encoder global-norm clip is bucket-invariant."""
    params = _tree()
    # give the encoder several same-shaped "layers" to actually bucket
    params["text_encoder"] = {
        f"l{i}": {"w": jax.random.normal(jax.random.PRNGKey(10 + i), (8, 8)),
                  "b": jnp.full((8,), 0.1 * i)}
        for i in range(4)}
    base = TGFRConfig().replace(weight_decay=0.02, clip_max_norm=1.0,
                                apply_grad_clip=True)
    p_ref, _ = _run_steps(optim.make_stage1_bert_tx(base), params)
    p_stk, st = _run_steps(optim.make_stage1_bert_tx(
        base.replace(stacked_optimizer=True)), params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        p_ref, p_stk)
    # stacked state round-trips LR edits (dict path of set_lr/get_lr)
    assert abs(optim.get_lr(st, "head") - 0.01 * (1 + hash("head") % 3)) < 1e-9


def test_stacked_matches_multi_transform_stage2():
    params = {
        "text_encoder": {"l0": {"w": jnp.ones((4, 4)) * 0.3},
                         "l1": {"w": jnp.ones((4, 4)) * -0.2}},
        "text_head": {"w": jnp.ones((4, 2)) * 0.2},
        "image_head": {"w": jnp.ones((2, 2)) * 0.1},
        "fusion_net": {"w": jnp.ones((2, 2)) * 0.5},
        "metric_fc": {"weight": jnp.ones((6, 2))},
    }
    base = TGFRConfig().replace(weight_decay=0.01)
    p_ref, _ = _run_steps(optim.make_stage2_tx(base), params)
    p_stk, _ = _run_steps(optim.make_stage2_tx(
        base.replace(stacked_optimizer=True)), params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        p_ref, p_stk)


def test_stacked_frozen_text_group_stays_frozen():
    params = _tree()
    args = TGFRConfig().replace(compat_frozen_text=True,
                                stacked_optimizer=True)
    tx = optim.make_stage1_bert_tx(args)
    state = tx.init(params)
    state = optim.set_lr(state, "encoder", 99.0)  # must no-op, not crash
    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p), params)
    updates, _ = tx.update(grads, state, params)
    for leaf in jax.tree_util.tree_leaves(updates["text_encoder"]):
        np.testing.assert_array_equal(np.asarray(leaf), 0.0)


def test_bf16_moments_close_to_fp32_and_state_dtype():
    """bf16 moment storage: trajectories stay close to fp32 Adam over a few
    steps (rounding-level drift only) and the stored moments really are
    bf16 (the point: half the optimizer-state bytes)."""
    params = _tree()
    base = TGFRConfig().replace(weight_decay=0.02)
    p32, _ = _run_steps(optim.make_stage1_bert_tx(base), params, n=5)
    p16, st = _run_steps(optim.make_stage1_bert_tx(
        base.replace(adam_moments_dtype="bfloat16")), params, n=5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-3),
        p32, p16)
    # walk the state for ScaleByAdamState moments and check their dtype
    found = []
    def visit(node):
        if hasattr(node, "mu") and hasattr(node, "nu"):
            for leaf in jax.tree_util.tree_leaves((node.mu, node.nu)):
                found.append(leaf.dtype)
        elif isinstance(node, (list, tuple)):
            for x in node:
                visit(x)
        elif isinstance(node, dict):
            for x in node.values():
                visit(x)
        elif hasattr(node, "_fields"):
            for f in node._fields:
                visit(getattr(node, f))
        elif hasattr(node, "inner_states"):
            visit(node.inner_states)
    visit(st)
    assert found and all(d == jnp.bfloat16 for d in found)


def test_stacked_plus_bf16_moments_compose():
    params = _tree()
    base = TGFRConfig().replace(weight_decay=0.02)
    p_ref, _ = _run_steps(optim.make_stage1_bert_tx(
        base.replace(adam_moments_dtype="bfloat16")), params, n=3)
    p_stk, _ = _run_steps(optim.make_stage1_bert_tx(
        base.replace(adam_moments_dtype="bfloat16", stacked_optimizer=True)),
        params, n=3)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        p_ref, p_stk)


def test_stacked_small_leaf_threshold_matches():
    """stack_max_elems: only small leaves bucket together; values still
    identical to the reference-shaped multi_transform."""
    params = _tree()
    params["text_encoder"] = {
        f"l{i}": {"w": jax.random.normal(jax.random.PRNGKey(20 + i), (8, 8)),
                  "b": jnp.full((8,), 0.05 * i)}
        for i in range(4)}
    base = TGFRConfig().replace(weight_decay=0.02)
    p_ref, _ = _run_steps(optim.make_stage1_bert_tx(base), params)
    p_stk, _ = _run_steps(optim.make_stage1_bert_tx(
        base.replace(stacked_optimizer=True, stack_max_elems=16)), params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        p_ref, p_stk)
    # the bucketing itself: 8-elem biases stack, 64-elem kernels do not
    from text_guided_face_recognition_tpu.engine.optim import _stack_tree
    st = _stack_tree(params["text_encoder"], max_elems=16)
    sizes = sorted(v.shape for v in st.values())
    assert (4, 8) in [tuple(s) for s in sizes]          # stacked biases
    assert all(tuple(s) != (4, 8, 8) for s in sizes)    # kernels unstacked


def _emb_tree(rows=32, dim=4):
    k = jax.random.split(jax.random.PRNGKey(3), 4)
    return {
        "image_head": {"proj": {"kernel": jax.random.normal(k[0], (6, 4))}},
        "text_encoder": {
            "emb": {"embedding": jax.random.normal(k[1], (rows, dim))},
            "l0": {"w": jax.random.normal(k[2], (4, 4))}},
        "image_cls": {"weight": jax.random.normal(k[3], (5, 4))},
        "text_cls": {"weight": jnp.ones((5, 4)) * 0.2},
        "text_head": {"w": jnp.ones((4, 4)) * 0.1},
    }


def test_lazy_embedding_adam_rows(monkeypatch):
    """Lazy embedding Adam (DEVIATIONS #19): rows with nonzero grads update
    exactly like dense torch-Adam (incl. weight decay and the encoder clip);
    untouched rows keep params bit-identical across steps (dense Adam keeps
    decaying/momentum-moving them)."""
    monkeypatch.setattr(optim, "EMB_MIN_ROWS", 16)
    params = _emb_tree(rows=32)
    touched = np.array([2, 5, 7, 19])
    base = TGFRConfig().replace(weight_decay=0.02, clip_max_norm=1.0, apply_grad_clip=True,
                                batch_size=8)  # _lazy_rows -> 256 >= 32 -> k=32
    tx_d = optim.make_stage1_bert_tx(base)
    tx_l = optim.make_stage1_bert_tx(base.replace(lazy_embedding_adam=True))

    def grads_for(params, i):
        g = jax.tree_util.tree_map(
            lambda p: jnp.sin(p + 0.1 * i) * 0.05, params)
        emb = np.zeros(params["text_encoder"]["emb"]["embedding"].shape,
                       np.float32)
        emb[touched] = 0.3 + 0.01 * i
        g["text_encoder"]["emb"]["embedding"] = jnp.asarray(emb)
        return g

    def run(tx):
        p = params
        st = tx.init(p)
        for grp in ("head", "encoder", "cls"):
            st = optim.set_lr(st, grp, 0.01)
        for i in range(3):
            u, st = tx.update(grads_for(p, i), st, p)
            p = optax.apply_updates(p, u)
        return p

    p_d, p_l = run(tx_d), run(tx_l)
    emb_d = np.asarray(p_d["text_encoder"]["emb"]["embedding"])
    emb_l = np.asarray(p_l["text_encoder"]["emb"]["embedding"])
    emb_0 = np.asarray(params["text_encoder"]["emb"]["embedding"])
    # touched rows: lazy == dense
    np.testing.assert_allclose(emb_l[touched], emb_d[touched],
                               rtol=1e-6, atol=1e-7)
    # untouched rows: lazy bit-frozen; dense moved them (wd + momentum)
    untouched = np.setdiff1d(np.arange(32), touched)
    np.testing.assert_array_equal(emb_l[untouched], emb_0[untouched])
    assert not np.allclose(emb_d[untouched], emb_0[untouched])
    # non-embedding leaves identical between the two paths
    for key in ("l0",):
        np.testing.assert_allclose(
            np.asarray(p_l["text_encoder"][key]["w"]),
            np.asarray(p_d["text_encoder"][key]["w"]), rtol=1e-6, atol=1e-7)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6, atol=1e-7),
        p_l["image_head"], p_d["image_head"])


def test_lazy_embedding_row_budget_keeps_largest(monkeypatch):
    """With more touched rows than the static budget, the top_k keeps the
    largest-gradient rows and drops the rest (documented bound: the budget is
    sized B*T so this cannot happen in training)."""
    monkeypatch.setattr(optim, "EMB_MIN_ROWS", 8)
    tx = optim._torch_adam(0.9, 0.999, lazy_emb_rows=2)
    table = jnp.zeros((16, 4))
    params = {"emb": table}
    st = tx.init(params)
    st = st._replace(hyperparams={"learning_rate": jnp.asarray(1.0)})
    g = np.zeros((16, 4), np.float32)
    g[3] = 1.0   # largest
    g[9] = 0.5
    g[12] = 0.01  # smallest — must be dropped at budget 2
    u, _ = tx.update({"emb": jnp.asarray(g)}, st, params)
    u = np.asarray(u["emb"])
    assert np.abs(u[3]).sum() > 0 and np.abs(u[9]).sum() > 0
    np.testing.assert_array_equal(u[12], 0.0)
    np.testing.assert_array_equal(np.delete(u, [3, 9], axis=0), 0.0)


def test_lazy_embedding_noop_without_big_tables():
    """With no >=EMB_MIN_ROWS leaf in the tree the lazy flag must be a
    value-level no-op vs the dense path (wiring guard)."""
    params = _tree()
    base = TGFRConfig().replace(weight_decay=0.02)
    p_ref, _ = _run_steps(optim.make_stage1_bert_tx(base), params)
    p_lazy, _ = _run_steps(optim.make_stage1_bert_tx(
        base.replace(lazy_embedding_adam=True)), params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-6, atol=1e-7),
        p_ref, p_lazy)


def test_bf16_grads_through_every_optimizer_path():
    """cast_grads(bfloat16) must flow through multi_transform, stacked and
    fused paths against fp32 params/state, and stay close to the fp32-grad
    update (bf16 rounding of the grad leaves only)."""
    params = _tree()
    base = TGFRConfig().replace(weight_decay=0.02, clip_max_norm=1.0,
                            apply_grad_clip=True)
    ref, _ = _run_steps(optim.make_stage1_bert_tx(
        base.replace(stacked_optimizer=False)), params)
    for cfg in (base.replace(stacked_optimizer=False),
                base.replace(stacked_optimizer=True, stack_max_elems=0),
                base.replace(stacked_optimizer=True, stack_max_elems=64),
                base.replace(stacked_optimizer=False, fused_optimizer=True)):
        tx = optim.make_stage1_bert_tx(cfg)
        state = tx.init(params)
        for g in ("head", "encoder", "cls"):
            state = optim.set_lr(state, g, 0.01 * (1 + hash(g) % 3))
        p = params
        import optax as _optax
        for i in range(3):
            grads = jax.tree_util.tree_map(
                lambda q: jnp.sin(q + 0.1 * i) * 0.05, p)
            grads = optim.cast_grads(grads, "bfloat16")
            assert jax.tree_util.tree_leaves(grads)[0].dtype == jnp.bfloat16
            updates, state = tx.update(grads, state, p)
            p = _optax.apply_updates(p, updates)
        # params must stay fp32 and track the fp32-grad trajectory
        jax.tree_util.tree_map(
            lambda a, b: (
                np.testing.assert_equal(np.asarray(a).dtype, np.float32),
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=0.02, atol=2e-4)),
            p, ref)


def test_clip_global_norm_fp32_accumulation_under_bf16():
    """The encoder-chain clip must compute the global norm with fp32
    accumulation even when the grad leaves are bf16: summing ~1e6 squares
    in bf16 loses the norm entirely (1 + eps == 1 in bf16 past 256)."""
    tx = optim._clip_global_norm(1.0)
    n = 1 << 16
    g32 = {"w": jnp.full((n,), 0.01, jnp.float32)}
    g16 = {"w": g32["w"].astype(jnp.bfloat16)}
    u32, _ = tx.update(g32, optax.EmptyState())
    u16, _ = tx.update(g16, optax.EmptyState())
    # true norm = 0.01*256 = 2.56 -> scale 1/2.56; bf16 accumulation would
    # saturate the running sum and mis-scale by >2x
    np.testing.assert_allclose(np.asarray(u16["w"], np.float32),
                               np.asarray(u32["w"]), rtol=0.02)
    assert float(jnp.abs(u16["w"]).max()) < 0.006  # actually clipped
