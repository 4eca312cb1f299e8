"""Subprocess worker for the 2-process multi-host data-path test.

Each worker is one "host": it initializes jax.distributed over a
localhost coordinator (2 virtual CPU devices per process -> a 4-device
global mesh), loads ITS OWN process-local rows through TrainLoader's
process sharding, assembles the global batch with
``jax.make_array_from_process_local_data`` (the shard_batch branch that
only executes when jax.process_count() > 1), and runs one dropout-free
train step. Process 0 writes the resulting loss for the parent test to
compare against the single-process value.

Usage: python multihost_worker.py <pid> <nproc> <port> <config> <out>
"""

import json
import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
config_path = sys.argv[4]
out_path = sys.argv[5]

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

sys.path.insert(0, os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..")))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from daft_exprt_tpu.config import HyperParams  # noqa: E402
from daft_exprt_tpu.data.loader import FeatureDataset, TrainLoader  # noqa: E402
from daft_exprt_tpu.models.daft_exprt import DaftExprt  # noqa: E402
from daft_exprt_tpu.parallel.mesh import (make_mesh, replicated,  # noqa: E402
                                          shard_batch)
from daft_exprt_tpu.training.step import (make_optimizer,  # noqa: E402
                                          make_train_step)

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 2 * nproc

hp = HyperParams.load(config_path)

ds = FeatureDataset(hp.training_files, hp)
loader = TrainLoader(ds, hp, process_index=jax.process_index(),
                     process_count=jax.process_count())
plan = loader.plan_epoch(0)
assert plan, "no steps planned"
local_batch = loader.assemble(plan[0])
# each process holds only its local rows
assert local_batch["symbols"].shape[1] == hp.batch_size // nproc

mesh = make_mesh()
model = DaftExprt(hp)
params = jax.device_put(model.init_params(jax.random.PRNGKey(0)),
                        replicated(mesh))
tx, _ = make_optimizer(hp)
opt_state = jax.device_put(tx.init(params), replicated(mesh))
step = make_train_step(model, hp, mesh=mesh, donate=False)

with mesh:
    batch = shard_batch(mesh, local_batch, batch_axis=1)
    _, _, metrics = step(params, opt_state, batch, jax.random.PRNGKey(1),
                         jnp.asarray(1, jnp.int32))
    loss = float(np.asarray(jax.device_get(metrics["loss"])))

if jax.process_index() == 0:
    with open(out_path, "w") as f:
        json.dump({"loss": loss, "processes": jax.process_count(),
                   "global_devices": len(jax.devices())}, f)
print(f"worker {pid}: loss={loss:.6f}", flush=True)
