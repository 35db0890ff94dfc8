"""Native data-plane tests: C++ copy engine + prefetching replay sampler.

Covers the framework's equivalent of the reference's torch-DataLoader native
workers (`trainers.py:649-653`): descriptor execution (memcpy / uint8->f32 /
memset), batch parity against `ReplayBuffer.sample_batch`, double-buffer
reuse semantics, and the pure-python fallback.
"""
import numpy as np
import pytest

from dreamer4_tpu.data.prefetch import (OP_MEMCPY, OP_MEMSET0, OP_U8_TO_F32,
                                        CopyEngine, PrefetchSampler, available)
from dreamer4_tpu.data.replay_buffer import ReplayBuffer


def test_native_library_builds():
    # g++ is part of this image; the native path must actually be exercised
    assert available()


def test_copy_engine_ops():
    eng = CopyEngine(num_workers=2)
    src = np.arange(64, dtype=np.float64)
    dst = np.zeros(64)
    u8 = np.arange(256, dtype=np.uint8)
    f32 = np.zeros(256, np.float32)
    junk = np.ones(32, np.float32)
    t = eng.submit([
        (OP_MEMCPY, src.ctypes.data, dst.ctypes.data, src.nbytes),
        (OP_U8_TO_F32, u8.ctypes.data, f32.ctypes.data, 256),
        (OP_MEMSET0, 0, junk.ctypes.data, junk.nbytes),
    ])
    eng.wait(t)
    np.testing.assert_array_equal(dst, src)
    np.testing.assert_allclose(f32, u8.astype(np.float32) / 255.0, rtol=1e-6)
    assert (junk == 0).all()
    eng.close()


def test_copy_engine_many_chunks():
    # more descriptors than workers: chunking + ticket accounting
    eng = CopyEngine(num_workers=3)
    srcs = [np.random.default_rng(i).standard_normal(17).astype(np.float32)
            for i in range(57)]
    dsts = [np.zeros(17, np.float32) for _ in srcs]
    t = eng.submit([(OP_MEMCPY, s.ctypes.data, d.ctypes.data, s.nbytes)
                    for s, d in zip(srcs, dsts)])
    eng.wait(t)
    for s, d in zip(srcs, dsts):
        np.testing.assert_array_equal(s, d)
    eng.close()


def test_empty_submit():
    eng = CopyEngine(num_workers=2)
    eng.wait(eng.submit([]))
    eng.close()


def _make_buffer(tmp_path, n_eps=12, max_t=20):
    buf = ReplayBuffer(tmp_path / 'buf', max_episodes=32, max_timesteps=max_t,
                       fields={'obs': ('uint8', (4, 4, 3)),
                               'state': ('float', 4),
                               'action': ('int', 1),
                               'reward': 'float'},
                       meta_fields={'task': ('int', ())})
    rng = np.random.default_rng(0)
    for e in range(n_eps):
        length = int(rng.integers(3, max_t + 1))
        with buf.one_episode(task=e):
            for t in range(length):
                buf.store(obs=rng.integers(0, 256, (4, 4, 3), dtype=np.uint8),
                          state=rng.standard_normal(4).astype(np.float32),
                          action=np.array([t % 3]),
                          reward=float(t))
    return buf


def test_prefetch_sampler_parity(tmp_path):
    """Same rng stream => PrefetchSampler batches == sample_batch batches."""
    buf = _make_buffer(tmp_path)
    sampler = PrefetchSampler(buf, batch_size=6, seq_len=8,
                              rng=np.random.default_rng(7))
    ref_rng = np.random.default_rng(7)
    for _ in range(5):
        got = next(sampler)
        want = buf.sample_batch(ref_rng, 6, seq_len=8)
        for k in ('obs', 'state', 'action', 'reward', 'lens', 'task'):
            np.testing.assert_array_equal(got[k], want[k], err_msg=k)
    sampler.close()


def test_prefetch_sampler_uint8_conversion(tmp_path):
    buf = _make_buffer(tmp_path)
    sampler = PrefetchSampler(buf, batch_size=4, seq_len=6,
                              rng=np.random.default_rng(3),
                              convert_uint8_fields=('obs',))
    ref_rng = np.random.default_rng(3)
    got = next(sampler)
    want = buf.sample_batch(ref_rng, 4, seq_len=6)
    assert got['obs'].dtype == np.float32
    np.testing.assert_allclose(got['obs'],
                               want['obs'].astype(np.float32) / 255.0,
                               rtol=1e-6)
    sampler.close()


def test_prefetch_batches_thread():
    from dreamer4_tpu.data.datasets import prefetch_batches

    def gen():
        for i in range(10):
            yield {'x': np.full((2, 2), i)}

    got = [b['x'][0, 0] for b in prefetch_batches(gen(), depth=3)]
    assert got == list(range(10))


def test_prefetch_batches_propagates_errors():
    from dreamer4_tpu.data.datasets import prefetch_batches

    def gen():
        yield {'x': 1}
        raise ValueError('boom')

    it = prefetch_batches(gen())
    assert next(it)['x'] == 1
    with pytest.raises(ValueError, match='boom'):
        next(it)


def test_prefetch_sampler_padding_zeroed(tmp_path):
    """Reused buffers must not leak previous-batch frames into the padding."""
    buf = _make_buffer(tmp_path, n_eps=8, max_t=20)
    sampler = PrefetchSampler(buf, batch_size=5, seq_len=19,
                              rng=np.random.default_rng(1))
    for _ in range(4):
        batch = next(sampler)
        for i, l in enumerate(batch['lens']):
            assert (batch['state'][i, int(l):] == 0).all()
            assert (batch['reward'][i, int(l):] == 0).all()
    sampler.close()
