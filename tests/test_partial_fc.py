"""Class-sharded (partial-FC) margin classifier validation.

Math level (fast): sharded_margin_ce on the 8-device CPU mesh must be
value- AND gradient-identical to the dense ops.margins + ops.losses path —
including the focal quirk, the cosface head, and masked class padding.

Integration level (slow): the partial-FC stage-2 step must match the
data-parallel shard_map fusion step leaf-for-leaf (both use per-shard BN
stats and the same fold_in dropout schedule, so they are the same math in
two collective schedules: replicated-W pmean grads vs sharded-W local
grads)."""

from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from text_guided_face_recognition_tpu import ops
from text_guided_face_recognition_tpu.parallel import make_mesh
from text_guided_face_recognition_tpu.parallel.partial_fc import (
    make_partial_fc_fusion_step,
    shard_state_for_partial_fc,
    sharded_margin_ce,
)


def _sharded_loss_fn(mesh, axis="data", **kw):
    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis, None), P(axis)), out_specs=P(),
             check_vma=False)
    def f(emb, w, label):
        return sharded_margin_ce(emb, w, label, axis, **kw)
    return f


def _dense_loss(emb, w, label, head="arcface", loss_kind="ce",
                easy_margin=False, num_classes=None):
    if num_classes is not None:
        w = w[:num_classes]
    if head == "arcface":
        logits = ops.arc_margin_logits(emb, w, label, s=30.0, m=0.5,
                                       easy_margin=easy_margin)
    else:
        logits = ops.add_margin_logits(emb, w, label, s=30.0, m=0.5)
    if loss_kind == "focal":
        return ops.focal_loss(logits, label, gamma=2.0)
    return ops.cross_entropy_rows(logits, label)


def _data(rng, b=16, d=32, c=40):
    emb = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(c, d)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, c, size=(b,)).astype(np.int32))
    return emb, w, label


@pytest.mark.parametrize("head,loss_kind,easy_margin", [
    ("arcface", "ce", False),
    ("arcface", "ce", True),
    ("arcface", "focal", False),
    ("cosface", "ce", False),
])
def test_sharded_margin_ce_matches_dense(rng, head, loss_kind, easy_margin):
    mesh = make_mesh(8)
    emb, w, label = _data(rng)
    kw = dict(head=head, loss_kind=loss_kind, easy_margin=easy_margin)

    sharded = _sharded_loss_fn(mesh, **kw)
    dense = lambda e, ww: _dense_loss(e, ww, label, **kw)  # noqa: E731

    lv_s = float(jax.jit(sharded)(emb, w, label))
    lv_d = float(jax.jit(dense)(emb, w))
    assert lv_s == pytest.approx(lv_d, rel=1e-5)

    gs = jax.jit(jax.grad(lambda e, ww: sharded(e, ww, label),
                          argnums=(0, 1)))(emb, w)
    gd = jax.jit(jax.grad(dense, argnums=(0, 1)))(emb, w)
    for a, b in zip(gs, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_sharded_margin_ce_padded_classes(rng):
    """37 true classes padded to 40 on 8 shards: identical value/grad to the
    37-class dense head; padded W rows receive exactly zero gradient."""
    mesh = make_mesh(8)
    c_true, c_pad = 37, 40
    emb, w, _ = _data(rng, c=c_pad)
    label = jnp.asarray(rng.integers(0, c_true, size=(16,)).astype(np.int32))

    sharded = _sharded_loss_fn(mesh, num_classes=c_true)
    dense = lambda e, ww: _dense_loss(e, ww, label,  # noqa: E731
                                      num_classes=c_true)

    assert float(jax.jit(sharded)(emb, w, label)) == pytest.approx(
        float(jax.jit(dense)(emb, w)), rel=1e-5)

    ge_s, gw_s = jax.jit(jax.grad(
        lambda e, ww: sharded(e, ww, label), argnums=(0, 1)))(emb, w)
    ge_d, gw_d = jax.jit(jax.grad(dense, argnums=(0, 1)))(emb, w)
    np.testing.assert_allclose(np.asarray(ge_s), np.asarray(ge_d),
                               rtol=1e-4, atol=1e-6)
    # gw_d is the grad wrt the FULL padded w (the dense loss slices inside),
    # so its padded rows are zero — compare all 40 rows directly
    np.testing.assert_allclose(np.asarray(gw_s), np.asarray(gw_d),
                               rtol=1e-4, atol=1e-6)
    assert np.all(np.asarray(gw_s)[c_true:] == 0.0)


def test_sharded_margin_ce_rejects_indivisible_head():
    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="unsupported sharded margin head"):
        f = _sharded_loss_fn(mesh, head="sphereface")
        f(jnp.zeros((8, 4)), jnp.zeros((8, 4)), jnp.zeros((8,), jnp.int32))


@pytest.mark.slow
def test_partial_fc_step_matches_dp_shardmap_step():
    """Same math, two collective schedules: the class-sharded step's params
    (metric_fc gathered) must match the replicated-W data-parallel shard_map
    step leaf-for-leaf after one step on the 8-device mesh."""
    from text_guided_face_recognition_tpu.config import TGFRConfig
    from text_guided_face_recognition_tpu.engine.stage2 import FusionTrainer
    from text_guided_face_recognition_tpu.parallel.spmd import (
        make_shardmap_fusion_step)

    args = TGFRConfig().replace(
        en_type="LSTM", synthetic=True, batch_size=8, num_workers=2,
        max_epoch=1, compute_dtype="float32", num_classes=16,
        lstm_words_num=8, captions_per_image=2, manual_seed=0,
        fusion_type="linear", CONFIG_NAME="Fusion",
        compat_frozen_text=True)
    tr = FusionTrainer(args)
    batch = {k: v for k, v in next(iter(tr.train_dl)).items() if k != "key"}
    rng = jax.random.PRNGKey(0)
    frozen = tr.backbone.variables
    mesh = make_mesh(8)
    cls_shape = (args.num_classes, args.fusion_final_dim)

    dp_step = make_shardmap_fusion_step(tr, mesh)
    dp_state, dp_m = dp_step(
        jax.tree_util.tree_map(jnp.copy, tr.state), batch, frozen, rng)

    pfc_step = make_partial_fc_fusion_step(tr, mesh)
    pfc_state0 = shard_state_for_partial_fc(
        jax.tree_util.tree_map(jnp.copy, tr.state), mesh, "data", cls_shape)
    pfc_state, pfc_m = pfc_step(pfc_state0, batch, frozen, rng)

    assert float(pfc_m["loss"]) == pytest.approx(float(dp_m["loss"]),
                                                 rel=1e-5)
    # metric_fc (SGD) and the frozen text encoder update exactly; the
    # Adam-driven head groups amplify the two schedules' fp reduction-order
    # noise at step 1 (update ~ sign(g) where v~g^2 is tiny, so an O(1e-7)
    # grad delta can move a near-zero coordinate by O(lr)) — compare those
    # with an absolute tolerance at the lr scale instead
    tight = ("metric_fc", "text_encoder")
    for name in dp_state.params:
        rtol, atol = ((1e-5, 1e-7) if name in tight else (1e-3, 5e-3))
        for a, b in zip(
                jax.tree_util.tree_leaves(dp_state.params[name]),
                jax.tree_util.tree_leaves(pfc_state.params[name])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=rtol, atol=atol, err_msg=name)

    # the classifier (and nothing else) stays row-sharded across the mesh
    # (jax canonicalizes the trailing None away from P("data", None))
    w = pfc_state.params["metric_fc"]["weight"]
    assert w.sharding.spec in (P("data"), P("data", None))
    assert int(pfc_state.step) == 1


def test_partial_fc_rejects_indivisible_classes():
    from text_guided_face_recognition_tpu.config import TGFRConfig
    from text_guided_face_recognition_tpu.parallel.partial_fc import (
        make_partial_fc_fusion_step)

    class _FakeTrainer:
        args = TGFRConfig().replace(num_classes=13)

    with pytest.raises(ValueError, match="divisible"):
        make_partial_fc_fusion_step(_FakeTrainer(), make_mesh(8))


@pytest.mark.slow
def test_partial_fc_at_100k_classes(rng):
    """Stress at a realistic identity count (VERDICT r3 #7): 131,072 classes
    at reduced dim on the 8-device mesh. The W shard each device holds must
    be exactly total/8 bytes (read from the REAL addressable shards), the
    value+grad step must run finite, and the loss must equal the dense
    single-device head."""
    from jax.sharding import NamedSharding

    c, d, b = 131072, 64, 16
    mesh = make_mesh(8)
    emb, w, label = _data(rng, b=b, d=d, c=c)
    w_sh = jax.device_put(w, NamedSharding(mesh, P("data", None)))
    shard_bytes = {s.data.nbytes for s in w_sh.addressable_shards}
    assert shard_bytes == {w_sh.nbytes // 8}

    f = _sharded_loss_fn(mesh, head="arcface")
    emb_sh = jax.device_put(emb, NamedSharding(mesh, P("data")))
    lab_sh = jax.device_put(label, NamedSharding(mesh, P("data")))

    @jax.jit
    def step(e, ww, l):
        return jax.value_and_grad(lambda w_: f(e, w_, l))(ww)

    loss, gw = step(emb_sh, w_sh, lab_sh)
    assert np.isfinite(float(loss))
    # grad keeps the class sharding (each device owns its rows' exact grads)
    assert len(gw.sharding.device_set) == 8
    dense = _dense_loss(emb, w, label)
    np.testing.assert_allclose(float(loss), float(dense), rtol=1e-5)
