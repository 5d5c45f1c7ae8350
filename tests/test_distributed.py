"""Distributed-layer tests on the virtual 8-device CPU mesh (SURVEY.md §4d):
sharded batches, psum-reduced RVQ codebook statistics, and mesh helpers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from flocoder_tpu.ops.rvq import rvq_init, rvq_apply
from flocoder_tpu.parallel.mesh import (make_mesh, shard_batch, data_sharding,
                                        replicated, DATA_AXIS)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


def test_mesh_uses_all_devices(mesh):
    assert mesh.devices.size == len(jax.devices())


def test_shard_batch_places_on_data_axis(mesh):
    x = np.random.randn(16, 4, 4, 2).astype(np.float32)
    xs = shard_batch(mesh, {"target": x})["target"]
    if mesh.size > 1:
        spec = xs.sharding.spec
        assert spec[0] == DATA_AXIS
    np.testing.assert_allclose(np.asarray(xs), x)


def test_rvq_psum_equals_single_device(mesh):
    """EMA codebook stats reduced with psum over the data axis must equal the
    single-device update on the full batch — the §2d cross-device
    communication requirement."""
    if mesh.size < 2:
        pytest.skip("needs multiple devices")
    from jax.experimental.shard_map import shard_map

    K, D, L, N = 8, 4, 2, 64
    state = rvq_init(jax.random.PRNGKey(0), L, K, D)
    # pre-init the codebooks so the kmeans branch (whose per-shard kmeans
    # is intentionally local) is skipped
    z_init = jax.random.normal(jax.random.PRNGKey(1), (N, D))
    _, _, _, state = rvq_apply(state, z_init, train=True,
                               rng=jax.random.PRNGKey(2))

    z = jax.random.normal(jax.random.PRNGKey(3), (N, D))
    rng = jax.random.PRNGKey(4)

    # single-device reference update (dead-code reseed disabled so the
    # random reseed picks don't depend on sharding)
    _, _, _, ref_state = rvq_apply(state, z, train=True, rng=rng,
                                   dead_threshold=-1.0)

    def sharded_update(state, z):
        _, _, _, new_state = rvq_apply(state, z, train=True, rng=rng,
                                       dead_threshold=-1.0,
                                       axis_name=DATA_AXIS)
        return new_state

    f = shard_map(sharded_update, mesh=mesh,
                  in_specs=(P(), P(DATA_AXIS)),
                  out_specs=P(),
                  check_rep=False)
    sh_state = f(state, z)

    np.testing.assert_allclose(np.asarray(sh_state.ema_counts),
                               np.asarray(ref_state.ema_counts),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sh_state.codebooks),
                               np.asarray(ref_state.codebooks),
                               rtol=1e-4, atol=1e-4)


def test_train_step_loss_matches_across_mesh_sizes():
    """The jitted flow train step must give the same loss on a 1-device and
    an 8-device mesh (deterministic rng, same batch)."""
    from flocoder_tpu.models.unet import Unet
    from flocoder_tpu.training.flow import (create_flow_state,
                                            make_flow_optimizer,
                                            make_flow_train_step)
    C, H = 1, 4
    model = Unet(dim=4, dim_mults=(1, 2), channels=C, n_classes=0,
                 resnet_block_groups=2)
    params = {"model": model.init(jax.random.PRNGKey(0),
                                  jnp.zeros((2, H, H, C)), jnp.zeros((2,)),
                                  None)}
    tx = make_flow_optimizer(1e-3)
    apply_fn = lambda p, x, t, c: model.apply(p, x, t, c)
    batch_np = {"target": np.random.default_rng(0).standard_normal(
        (16, H, H, C)).astype(np.float32)}
    losses = []
    for n_data in (1, None):  # None → all devices
        mesh = make_mesh(n_data=n_data)
        state = create_flow_state(params, tx)
        step = make_flow_train_step(apply_fn, tx, donate=False)
        _, aux = step(state, shard_batch(mesh, batch_np),
                      jax.random.PRNGKey(7))
        losses.append(float(aux["loss"]))
    assert abs(losses[0] - losses[1]) < 1e-4, losses
