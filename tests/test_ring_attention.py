"""Ring attention: multi-device (8-way virtual CPU mesh) vs single-device
full attention — the mesh-sharded parity idiom from SURVEY.md section 4."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import mesh_utils
from jax.sharding import Mesh

from dreamer4_tpu.ops.attention import naive_attend
from dreamer4_tpu.ops.masks import build_attend_mask
from dreamer4_tpu.parallel.ring_attention import make_ring_attention


@pytest.fixture(scope='module')
def mesh():
    devices = mesh_utils.create_device_mesh((8,))
    return Mesh(devices, ('sp',))


@pytest.mark.parametrize('causal', [True, False])
def test_ring_matches_full(mesh, causal):
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    b, h, n, d = 2, 2, 64, 16  # 8 frames per device
    q = jax.random.normal(kq, (b, h, n, d))
    k = jax.random.normal(kk, (b, h, n, d))
    v = jax.random.normal(kv, (b, h, n, d))

    ring = make_ring_attention(mesh, 'sp', causal=causal)
    out_ring = jax.jit(ring)(q, k, v)

    mask = build_attend_mask(n, n, causal=causal)
    out_full = naive_attend(q, k, v, mask=mask, softclamp_value=50.0)

    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_full),
                               atol=2e-5, rtol=1e-4)


def test_ring_gqa(mesh):
    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (1, 4, 32, 16))
    k = jax.random.normal(kk, (1, 2, 32, 16))
    v = jax.random.normal(kv, (1, 2, 32, 16))

    ring = make_ring_attention(mesh, 'sp', causal=True)
    out_ring = jax.jit(ring)(q, k, v)

    mask = build_attend_mask(32, 32, causal=True)
    out_full = naive_attend(q, k, v, mask=mask, softclamp_value=50.0)
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_full),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize('gqa', [False, True])
def test_flash_ring_matches_full_fwd_and_grad(mesh, gqa):
    """Ring attention built from the fused Pallas kernels (interpret mode on
    CPU): forward AND gradients vs dense single-device attention. This is
    the round-2 composition of the two flagship perf features — sequence
    parallelism and the flash kernel — that round 1 kept mutually
    exclusive."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    from dreamer4_tpu.parallel.ring_attention import ring_attend

    # 2-device submesh keeps interpret-mode kernel work small (local 128)
    sub = Mesh(np.asarray(jax.devices()[:2]), ('sp',))
    key = jax.random.PRNGKey(2)
    kq, kk, kv, kg = jax.random.split(key, 4)
    hq, hk = (4, 2) if gqa else (2, 2)
    b, n, d = 1, 256, 16
    q = jax.random.normal(kq, (b, hq, n, d))
    k = jax.random.normal(kk, (b, hk, n, d))
    v = jax.random.normal(kv, (b, hk, n, d))
    g = jax.random.normal(kg, (b, hq, n, d))

    spec = P(None, None, 'sp', None)

    @partial(jax.shard_map, mesh=sub, in_specs=(spec, spec, spec), out_specs=spec,
             check_vma=False)  # pallas_call outputs carry no vma info
    def ring(q_, k_, v_):
        return ring_attend(q_, k_, v_, axis_name='sp', causal=True,
                           use_flash=True, interpret=True)

    def loss_ring(q, k, v):
        return (ring(q, k, v) * g).sum()

    mask = build_attend_mask(n, n, causal=True)

    def loss_full(q, k, v):
        return (naive_attend(q, k, v, mask=mask, softclamp_value=50.0) * g).sum()

    out_ring = jax.jit(ring)(q, k, v)
    out_full = naive_attend(q, k, v, mask=mask, softclamp_value=50.0)
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_full),
                               atol=5e-5, rtol=1e-3)

    g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
    g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ring, g_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5, rtol=1e-3)


def test_trunk_time_ring_matches_dense(mesh):
    """Transformer with time_ring_axis under the ambient mesh equals the
    dense-mask forward — sequence-parallel training of the trunk."""
    from dreamer4_tpu.models.transformer import AxialSpaceTimeTransformer

    kwargs = dict(dim=16, depth=2, attn_heads=2, attn_dim_head=8,
                  time_block_every=2, num_special_tokens=1)
    model = AxialSpaceTimeTransformer(**kwargs)
    model_ring = AxialSpaceTimeTransformer(**kwargs, time_ring_axis='sp')

    tokens = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 4, 16))
    params = model.init(jax.random.PRNGKey(1), tokens)

    out_dense, _ = model.apply(params, tokens)

    with jax.set_mesh(mesh):
        out_ring, _ = jax.jit(lambda p, x: model_ring.apply(p, x))(params, tokens)

    np.testing.assert_allclose(np.asarray(out_dense), np.asarray(out_ring),
                               atol=2e-5, rtol=1e-4)
