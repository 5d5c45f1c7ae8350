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
    from flocoder_tpu.parallel.mesh import shard_map

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


def test_shard_map_train_step_per_shard_ot(mesh):
    """The explicit shard_map path (mesh= kwarg): per-shard OT pairing,
    pmean'd grads, replicated state — deterministic, finite, and learning."""
    if mesh.size < 2:
        pytest.skip("needs multiple devices")
    from flocoder_tpu.models.unet import Unet
    from flocoder_tpu.training.flow import (create_flow_state,
                                            make_flow_optimizer,
                                            make_flow_train_step)
    C, H = 1, 4
    model = Unet(dim=4, dim_mults=(1, 2), channels=C, n_classes=2,
                 resnet_block_groups=2)
    cond0 = {"class_cond": jnp.zeros((2,), jnp.int32), "mask_cond": None}
    params = {"model": model.init(jax.random.PRNGKey(0),
                                  jnp.zeros((2, H, H, C)), jnp.zeros((2,)),
                                  cond0)}
    tx = make_flow_optimizer(3e-3)
    apply_fn = lambda p, x, t, c: model.apply(p, x, t, c)
    step = make_flow_train_step(apply_fn, tx, donate=False, mesh=mesh)

    rng_np = np.random.default_rng(0)
    cls = rng_np.integers(0, 2, 32).astype(np.int32)
    # two-cluster latents keyed on the class
    target = (cls[:, None, None, None] * 2.0 - 1.0) * np.ones(
        (32, H, H, C), np.float32)
    batch = shard_batch(mesh, {"target": target, "class_cond": cls})

    state = create_flow_state(params, tx)
    s1, aux1 = step(state, batch, jax.random.PRNGKey(5))
    s1b, aux1b = step(state, batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(aux1["loss"]))
    # deterministic across invocations
    assert float(aux1["loss"]) == float(aux1b["loss"])
    # params remain replicated and usable by a plain (unsharded) step
    first = float(aux1["loss"])
    st = s1
    for i in range(6):
        st, aux = step(st, batch, jax.random.PRNGKey(10 + i))
    assert float(aux["loss"]) < first * 1.5  # trains without blowup
    leaf = jax.tree_util.tree_leaves(st.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_loader_host_shard_partition():
    """Per-host input pipeline (SURVEY §5.8): each host sees a disjoint slice
    of the same seeded global shuffle; lengths divide accordingly."""
    from flocoder_tpu.data.datasets import Loader

    class Toy:
        def __len__(self):
            return 32

        def get(self, i, rng):
            return np.full((2, 2, 1), float(i), np.float32), np.int32(i)

    seen = {}
    for host in range(2):
        loader = Loader(Toy(), batch_size=4, shuffle=True, num_workers=1,
                        seed=9, host_shard=(host, 2))
        assert len(loader) == 4  # 32 / 2 hosts / batch 4
        ids = []
        for b in loader:
            ids.extend(int(v) for v in b["class_cond"])
        seen[host] = set(ids)
        assert len(ids) == 16
    assert seen[0].isdisjoint(seen[1])
    assert seen[0] | seen[1] == set(range(32))


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


def test_multislice_dcn_mesh_train_step():
    """('dcn','data','model') mesh (SURVEY §5.8 multi-slice): the shard_map
    step splits the batch over both dcn and data axes and pmean-reduces
    grads across them; 2 virtual slices × 4 devices."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from flocoder_tpu.models.unet import Unet
    from flocoder_tpu.parallel.mesh import batch_axis_names
    from flocoder_tpu.training.flow import (create_flow_state,
                                            make_flow_optimizer,
                                            make_flow_train_step)
    mesh2 = make_mesh(n_data=4, n_dcn=2)
    assert mesh2.axis_names == ("dcn", "data", "model")
    assert batch_axis_names(mesh2) == ("dcn", "data")
    C, H = 1, 4
    model = Unet(dim=4, dim_mults=(1, 2), channels=C, n_classes=0,
                 resnet_block_groups=2)
    params = {"model": model.init(jax.random.PRNGKey(0),
                                  jnp.zeros((2, H, H, C)), jnp.zeros((2,)),
                                  None)}
    tx = make_flow_optimizer(1e-3)
    step = make_flow_train_step(lambda p, x, t, c: model.apply(p, x, t, c),
                                tx, donate=False, mesh=mesh2)
    batch = shard_batch(mesh2, {"target": np.random.default_rng(0)
                                .standard_normal((16, H, H, C))
                                .astype(np.float32)})
    state = create_flow_state(params, tx)
    state, aux = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(aux["loss"]))


def test_fsdp_state_sharding_matches_replicated(mesh):
    """FSDP-style param sharding (fsdp_param_shardings + shard_state) through
    the plain-jit train step must reproduce the replicated run exactly —
    XLA's SPMD partitioner owns the all-gather/reduce-scatter dataflow."""
    if mesh.size < 2:
        pytest.skip("needs multiple devices")
    from flocoder_tpu.models.unet import Unet
    from flocoder_tpu.parallel.mesh import fsdp_param_shardings, shard_state
    from flocoder_tpu.training.flow import (create_flow_state,
                                            make_flow_optimizer,
                                            make_flow_train_step)
    C, H = 1, 4
    model = Unet(dim=8, dim_mults=(1, 2), channels=C, n_classes=2,
                 resnet_block_groups=2)
    cond0 = {"class_cond": jnp.zeros((2,), jnp.int32), "mask_cond": None}
    params = {"model": model.init(jax.random.PRNGKey(0),
                                  jnp.zeros((2, H, H, C)), jnp.zeros((2,)),
                                  cond0)}
    tx = make_flow_optimizer(3e-3)
    apply_fn = lambda p, x, t, c: model.apply(p, x, t, c)
    step = make_flow_train_step(apply_fn, tx, donate=False)

    rng_np = np.random.default_rng(0)
    cls = rng_np.integers(0, 2, 16).astype(np.int32)
    target = rng_np.standard_normal((16, H, H, C)).astype(np.float32)
    batch = shard_batch(mesh, {"target": target, "class_cond": cls})

    # some tensor actually gets sharded (min_size tuned down for the test)
    sh = fsdp_param_shardings(mesh, create_flow_state(params, tx),
                              min_size=64)
    n_sharded = sum(
        1 for s in jax.tree_util.tree_leaves(
            sh, is_leaf=lambda x: hasattr(x, "spec"))
        if any(d is not None for d in s.spec))
    assert n_sharded > 0

    state_rep = create_flow_state(params, tx)
    state_fsdp = shard_state(mesh, create_flow_state(params, tx),
                             min_size=64)
    for i in range(3):
        k = jax.random.PRNGKey(i)
        state_rep, aux_rep = step(state_rep, batch, k)
        state_fsdp, aux_fsdp = step(state_fsdp, batch, k)
    np.testing.assert_allclose(float(aux_fsdp["loss"]),
                               float(aux_rep["loss"]), rtol=1e-5)
    w_rep = jax.tree_util.tree_leaves(state_rep.params)[0]
    w_fsdp = jax.tree_util.tree_leaves(state_fsdp.params)[0]
    # sharded vs replicated programs reduce in different orders; after 3
    # Adam steps the FP noise floor is ~1e-5, not exact equality
    np.testing.assert_allclose(np.asarray(w_fsdp), np.asarray(w_rep),
                               rtol=1e-3, atol=1e-4)
    # params are STILL sharded after the steps (sharding survived the jit)
    leaves = jax.tree_util.tree_leaves(state_fsdp.params)
    assert any(
        not x.sharding.is_fully_replicated for x in leaves
        if hasattr(x, "sharding")), "no param stayed sharded through steps"


def test_vqgan_tp_gspmd_matches_replicated():
    """Tensor-parallel codec training (train_vqgan.py `codec.tp`): plain-jit
    warmup steps with params sharded over the 'model' axis
    (tp_param_shardings) must match the replicated run — GSPMD derives the
    Megatron-style collectives purely from placement."""
    from flocoder_tpu.config import config_from_dict
    from flocoder_tpu.models.codecs import VQVAE
    from flocoder_tpu.parallel.mesh import (make_mesh, shard_state_tp,
                                            tp_param_shardings)
    from flocoder_tpu.training.vqgan import (create_vqgan_state,
                                             make_vqgan_optimizers,
                                             make_vqgan_warmup_step)
    if jax.device_count() < 4:
        pytest.skip("needs >=4 devices")
    B, S = 8, 16
    cfg = config_from_dict({"codec": {
        "choice": "vqgan", "in_channels": 3, "hidden_channels": 16,
        "num_downsamples": 2, "internal_dim": 16, "vq_embedding_dim": 4,
        "codebook_levels": 2, "vq_num_embeddings": 8,
        "commitment_weight": 0.5, "image_size": S,
        "lambda_mse": 0.5, "lambda_vq": 0.25}})
    codec = VQVAE(in_channels=3, hidden_channels=16, num_downsamples=2,
                  internal_dim=16, vq_embedding_dim=4, codebook_levels=2,
                  vq_num_embeddings=8)
    params = codec.init(jax.random.PRNGKey(0), jnp.zeros((2, S, S, 3)))
    tx_g, tx_d = make_vqgan_optimizers(1e-3)
    step = make_vqgan_warmup_step(codec, tx_g, cfg)  # plain jit
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (B, S, S, 3)).astype(np.float32) * 0.5)

    mesh = make_mesh(n_data=2, n_model=4)
    # the tiny test net needs a tiny min_size so convs actually shard
    sh = tp_param_shardings(mesh, create_vqgan_state(params, tx_g),
                            min_size=64)
    n_sharded = sum(1 for s in jax.tree_util.tree_leaves(
        sh, is_leaf=lambda s: hasattr(s, "spec"))
        if any(d is not None for d in s.spec))
    assert n_sharded > 0

    state_rep = create_vqgan_state(params, tx_g)
    state_tp = shard_state_tp(mesh, create_vqgan_state(params, tx_g),
                              min_size=64)
    for i in range(3):
        k = jax.random.PRNGKey(10 + i)
        state_rep, aux_rep, _ = step(state_rep, x, k)
        state_tp, aux_tp, _ = step(state_tp, x, k)
    np.testing.assert_allclose(float(aux_tp["total"]),
                               float(aux_rep["total"]), rtol=1e-4)
    w_rep = jax.tree_util.tree_leaves(state_rep.params["encoder"])[0]
    w_tp = jax.tree_util.tree_leaves(state_tp.params["encoder"])[0]
    np.testing.assert_allclose(np.asarray(w_tp), np.asarray(w_rep),
                               rtol=1e-3, atol=1e-4)
    leaves = jax.tree_util.tree_leaves(state_tp.params)
    assert any(not x.sharding.is_fully_replicated for x in leaves
               if hasattr(x, "sharding")), "no param stayed TP-sharded"
