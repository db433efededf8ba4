"""Worker for tests/test_multiprocess.py — runs as one of two REAL jax
processes (jax.distributed over Gloo on the CPU backend, 4 virtual devices
per process) and exercises every `process_count > 1` branch in the repo:

  * data/loader.py `process_shard`: each process yields only its contiguous
    slice of the seeded global batch (identical global composition across
    hosts) — via engine/prepare.prepare_dataloader's wiring.
  * parallel/mesh.shard_batch: global jax.Array assembly from process-local
    slices (jax.make_array_from_process_local_data) + the explicit
    global_shape guard against full-batch callers.
  * engine/evaluate.eval_mesh: on a pod the eval mesh spans only THIS
    process's devices (per-host DataParallel semantics).
  * batch-global contrastive semantics: a jitted B x B score matrix over the
    process-sharded batch psums to the same value every process computes
    from the full global batch.

Exit code 0 + "MP_WORKER_OK" on stdout = all assertions passed.
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from text_guided_face_recognition_tpu.config import TGFRConfig  # noqa: E402
from text_guided_face_recognition_tpu.engine import (  # noqa: E402
    evaluate as ev, prepare as prep)
from text_guided_face_recognition_tpu.parallel.mesh import (  # noqa: E402
    make_mesh, shard_batch)

assert jax.process_count() == nproc
assert len(jax.local_devices()) == 4 and jax.device_count() == 4 * nproc

B = 16  # global batch
args = TGFRConfig().replace(
    en_type="LSTM", synthetic=True, batch_size=B, num_workers=2,
    num_classes=8, lstm_words_num=8, captions_per_image=2, manual_seed=7,
    num_devices=0)

# ---- 1. prepare_dataloader wires process_shard on a pod ------------------
train_dl, train_ds = prep.prepare_dataloader(args, "train")
assert train_dl.process_shard == (pid, nproc), train_dl.process_shard
local_batch = next(iter(train_dl))
local_batch = {k: v for k, v in local_batch.items() if k != "key"}
assert local_batch["img"].shape[0] == B // nproc  # local slice only

# every host draws the same seeded permutation -> reconstruct the global
# batch this process EXPECTS and check its slice matches what it got.
# Fresh dataset: per-item rng draws depend on (seed, index, visit#), so the
# probe must start from visit 0 like train_dl's dataset did.
_, probe_ds = prep.prepare_dataloader(args, "train")
probe = type(train_dl)(probe_ds, batch_size=B, drop_last=True,
                       shuffle=True, num_workers=2, seed=args.manual_seed,
                       process_shard=None)
full = next(iter(probe))
lo, hi = pid * (B // nproc), (pid + 1) * (B // nproc)
np.testing.assert_array_equal(local_batch["cls_id"], full["cls_id"][lo:hi])
np.testing.assert_array_equal(local_batch["caps"], full["caps"][lo:hi])

# ---- 2. shard_batch assembles the global array from local slices --------
mesh = make_mesh(0)  # all 8 devices across both processes
assert mesh.size == 4 * nproc
device_batch = shard_batch(local_batch, mesh, expected_global_rows=B)
assert device_batch["img"].shape[0] == B  # GLOBAL leading axis
# global reduction over the assembled array == host-side sum of the full
# batch (both processes can compute the expectation from the shared seed)
total = jax.jit(lambda x: x.sum(),
                out_shardings=NamedSharding(mesh, P()))(device_batch["img"])
# fp32 accumulation-order slack on a near-cancelling sum -> absolute tol
np.testing.assert_allclose(float(total),
                           float(full["img"].astype(np.float64).sum()),
                           rtol=1e-5, atol=0.1)

# the expected_global_rows guard: a full (non-process-sharded) batch must
# fail loudly, not silently duplicate into a 2x global batch (jax's
# make_array_from_process_local_data accepts ANY local size — this was a
# real hole until this fixture first executed the branch)
try:
    shard_batch({"x": full["img"]}, mesh, expected_global_rows=B)
except ValueError as e:
    assert "duplicate" in str(e)
else:
    raise AssertionError("shard_batch accepted a full batch on a pod "
                         "(expected_global_rows guard missing)")

# prefetch_to_device wires the guard from the loader's own attributes:
# an un-sharded loader on a pod is rejected up front
from text_guided_face_recognition_tpu.parallel.mesh import (  # noqa: E402
    prefetch_to_device)
try:
    next(iter(prefetch_to_device(probe, mesh)))
except ValueError as e:
    assert "process-sharded" in str(e)
else:
    raise AssertionError("prefetch_to_device accepted an un-sharded "
                         "loader on a pod")
# ... and passes with the correctly sharded loader
pf = next(iter(prefetch_to_device(train_dl, mesh, drop_keys=("key",))))
assert pf["img"].shape[0] == B

# ---- 3. batch-global contrastive semantics across hosts ------------------
# B x B score matrix over the global batch: psum/log-sum-exp style checks
# that XLA's collectives see every host's negatives (the DataParallel
# gathered-loss semantics, SURVEY §2.12)
emb = jax.device_put(np.float32(full["img"].reshape(B, -1)[:, :32]))


def score_sum(x):
    m = x @ x.T  # contracts the sharded axis -> all-gather over ICI
    return m.sum()


sharded_x = shard_batch(
    {"x": local_batch["img"].reshape(B // nproc, -1)[:, :32]}, mesh)["x"]
got = jax.jit(score_sum,
              out_shardings=NamedSharding(mesh, P()))(sharded_x)
want = np.asarray(emb, np.float64) @ np.asarray(emb, np.float64).T
np.testing.assert_allclose(float(got), float(want.sum()),
                           rtol=1e-5, atol=0.1)

# ---- 4. eval_mesh spans only this process's devices ----------------------
emesh = ev.eval_mesh(args)
assert emesh is not None and emesh.size == 4, emesh
assert set(emesh.devices.flat) == set(jax.local_devices())

# ---- 5. evaluate._shard_eval round-trips on the local mesh ---------------
a = np.arange(6 * 3, dtype=np.float32).reshape(6, 3)  # 6 % 4 != 0 -> pad
(sh_a,), n_real = ev._shard_eval([a], emesh)
assert n_real == 6 and sh_a.shape == (8, 3)
np.testing.assert_array_equal(np.asarray(sh_a)[:6], a)

print(f"MP_WORKER_OK pid={pid}", flush=True)
