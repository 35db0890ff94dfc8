"""Host data-plane benchmark: native PrefetchSampler vs synchronous numpy.

Simulates the trainer pattern (sample batch -> device step) with a fixed
busy-step duration and measures wall time per iteration for:
  a) ReplayBuffer.sample_batch (synchronous numpy assembly)
  b) PrefetchSampler (C++ worker pool, double-buffered, overlapped)

Run: python scripts/bench_prefetch.py
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from dreamer4_tpu.data.prefetch import PrefetchSampler, available
from dreamer4_tpu.data.replay_buffer import ReplayBuffer

EPISODES, T_MAX = 128, 100
BATCH, SEQ = 32, 64
STEP_S = 0.02   # simulated device-step time the assembly should hide under
ITERS = 40


def busy_wait(seconds):
    end = time.perf_counter() + seconds
    while time.perf_counter() < end:
        pass


def main(tmp='/tmp/prefetch_bench_buf'):
    print(f'native engine available: {available()}')
    buf = ReplayBuffer(tmp, max_episodes=EPISODES, max_timesteps=T_MAX,
                       fields={'obs': ('uint8', (64, 64, 3)),
                               'state': ('float', 8),
                               'action': ('int', 2),
                               'reward': 'float'})
    if buf.num_episodes < EPISODES:
        rng = np.random.default_rng(0)
        frame = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        for e in range(EPISODES):
            with buf.one_episode():
                for t in range(T_MAX):
                    buf.store(obs=frame, state=np.zeros(8, np.float32),
                              action=np.zeros(2, np.int64), reward=1.0)

    # a) synchronous
    rng = np.random.default_rng(1)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        batch = buf.sample_batch(rng, BATCH, seq_len=SEQ)
        batch['obs'] = batch['obs'].astype(np.float32) / 255.0
        busy_wait(STEP_S)
    sync = (time.perf_counter() - t0) / ITERS

    # b) native prefetch (uint8->f32 in the C++ pool, overlapped)
    sampler = PrefetchSampler(buf, BATCH, SEQ, rng=np.random.default_rng(1),
                              convert_uint8_fields=('obs',))
    next(sampler)  # warm
    t0 = time.perf_counter()
    for _ in range(ITERS):
        batch = next(sampler)
        busy_wait(STEP_S)
    pref = (time.perf_counter() - t0) / ITERS
    sampler.close()

    mb = BATCH * SEQ * (64 * 64 * 3 * 5 + 8 * 4 + 2 * 8 + 4) / 1e6
    print(f'batch payload ~{mb:.0f} MB (obs u8->f32 dominates)')
    print(f'synchronous:  {sync*1e3:7.2f} ms/iter  (assembly {1e3*(sync-STEP_S):.2f} ms on top of the {STEP_S*1e3:.0f} ms step)')
    print(f'prefetched:   {pref*1e3:7.2f} ms/iter  (assembly {1e3*(pref-STEP_S):.2f} ms on top)')
    print(f'assembly-overhead reduction: {(sync-STEP_S)/max(pref-STEP_S, 1e-9):.1f}x')


if __name__ == '__main__':
    main()
