"""Multi-process training equivalence (VERDICT round-1 item 8): two
CPU processes joined by jax.distributed over one global mesh must produce
exactly the same post-update params as a single process training on the
full batch — gradient averaging across processes via GSPMD collectives."""
import re
import socket
import subprocess
import sys
from pathlib import Path

import pytest

SCRIPT = Path(__file__).resolve().parent.parent / 'scripts' / 'multihost_dryrun.py'


def _free_port():
    with socket.socket() as s:
        s.bind(('', 0))
        return s.getsockname()[1]


def _parse(out: str):
    m = re.search(r'loss=([-\d.]+) checksum=([-\d.]+)', out)
    assert m, f'no result line in output:\n{out}'
    return float(m.group(1)), float(m.group(2))


@pytest.mark.slow
def test_two_process_training_matches_single():
    env = {'PYTHONUNBUFFERED': '1'}
    import os

    env = {**os.environ, **env}
    env.pop('XLA_FLAGS', None)  # script sets its own device count

    single = subprocess.run(
        [sys.executable, str(SCRIPT), '--role', 'single'],
        capture_output=True, text=True, timeout=600, env=env)
    assert single.returncode == 0, single.stderr[-2000:]
    loss_s, sum_s = _parse(single.stdout)

    port = _free_port()
    workers = [
        subprocess.Popen(
            [sys.executable, str(SCRIPT), '--role', 'worker',
             '--process-id', str(i), '--num-processes', '2',
             '--port', str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for w in workers:
        out, err = w.communicate(timeout=600)
        assert w.returncode == 0, err[-2000:]
        outs.append(_parse(out))

    for loss_w, sum_w in outs:
        assert abs(loss_w - loss_s) < 1e-4, (loss_w, loss_s)
        assert abs(sum_w - sum_s) / max(abs(sum_s), 1.0) < 1e-5, (sum_w, sum_s)


@pytest.mark.slow
def test_two_process_env_fanout_rl_matches_single():
    """Per-host actor fleet: each process runs its own EnvInteractor; the
    host-local Experiences assemble into one global batch and a single SPMD
    RL update must equal the single-process reference that replayed every
    host's interaction."""
    import os

    env = {**os.environ, 'PYTHONUNBUFFERED': '1'}
    env.pop('XLA_FLAGS', None)

    single = subprocess.run(
        [sys.executable, str(SCRIPT), '--role', 'rl-single'],
        capture_output=True, text=True, timeout=600, env=env)
    assert single.returncode == 0, single.stderr[-2000:]
    loss_s, sum_s = _parse(single.stdout)

    port = _free_port()
    workers = [
        subprocess.Popen(
            [sys.executable, str(SCRIPT), '--role', 'rl-worker',
             '--process-id', str(i), '--num-processes', '2',
             '--port', str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(2)
    ]
    for w in workers:
        out, err = w.communicate(timeout=600)
        assert w.returncode == 0, err[-2000:]
        loss_w, sum_w = _parse(out)
        assert abs(loss_w - loss_s) < 1e-4, (loss_w, loss_s)
        assert abs(sum_w - sum_s) / max(abs(sum_s), 1.0) < 1e-5, (sum_w, sum_s)
