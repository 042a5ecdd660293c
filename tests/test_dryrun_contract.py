"""Contract-dims multi-chip certifications, independent of the driver.

These are the same certifications ``__graft_entry__.dryrun_multichip``
runs in groups 2-3; the dryrun may SKIP them when its time budget is
tight (HD_DRYRUN_BUDGET_S), so this slow-tier test guarantees they are
always exercised somewhere. GSPMD partitioning decisions are
shape-dependent — compiling at phi=2048 / 6890 verts certifies the real
sharded programs (tester.py:260-312 window semantics; SURVEY.md §2.3).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from human_dynamics_tpu.core import synthetic_smpl_model
from human_dynamics_tpu.models import HmmrModel
from human_dynamics_tpu.parallel import (
    make_mesh,
    make_mesh_2d,
    replicate,
    shard_batch,
    shard_batch_2d,
)
from human_dynamics_tpu.parallel.halo import predict_clip_sharded
from human_dynamics_tpu.train.trainer import Trainer
from human_dynamics_tpu.utils.config import Config

N = 8


def contract_config():
    return Config(
        batch_size=N, T=20, feature_dim=2048, num_kps=19, data_mesh_size=N
    )


def test_dp_train_step_executes_at_contract_dims():
    import __graft_entry__ as ge

    config = contract_config()
    smpl = synthetic_smpl_model(num_verts=6890, num_kps=19)
    batch = ge._make_batch(config, np.random.RandomState(0))
    mesh = make_mesh(N)
    trainer = Trainer(config, smpl)
    trainer.state = replicate(trainer.state, mesh)
    m = trainer.step(shard_batch(batch, mesh))
    assert np.isfinite(float(m["e_loss"]))
    assert np.isfinite(float(m["d_loss"]))


def test_2d_train_step_compiles_at_contract_dims():
    import __graft_entry__ as ge

    config = contract_config()
    smpl = synthetic_smpl_model(num_verts=6890, num_kps=19)
    batch = ge._make_batch(config, np.random.RandomState(0))
    mesh2d = make_mesh_2d(N // 2, 2)
    trainer = Trainer(config, smpl)
    state2d = replicate(trainer.state, mesh2d)
    compiled = trainer._jit_step.lower(
        state2d, shard_batch_2d(batch, mesh2d), jax.random.PRNGKey(7)
    ).compile()
    assert compiled is not None


def test_halo_full_clip_compiles_at_contract_dims():
    model = HmmrModel(feature_dim=2048, do_hallucinate=False)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 20, 2048)))
    smpl = synthetic_smpl_model(num_verts=6890, num_kps=25)
    mesh_time = make_mesh(N, axis_name="time")
    phi = jnp.asarray(
        np.random.RandomState(0).randn(5 * N + 3, 2048).astype(np.float32)
    )
    compiled = jax.jit(
        lambda p: predict_clip_sharded(model, variables, smpl, p, mesh_time)
    ).lower(phi).compile()
    assert compiled is not None
