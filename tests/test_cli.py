"""End-to-end CLI tests: dataset resolution (folder/glob/replay-buffer),
checkpointing with EMA + `latest`, auto-resume, metric/gif logging
(reference `cli.py:65-96, 130-134, 207-211`)."""
import json

import numpy as np
import pytest

from dreamer4_tpu.cli import main


def make_gif_folder(path, n_videos=4, frames=3, size=16, with_sidecars=False):
    from dreamer4_tpu.data.video_io import save_gif

    path.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n_videos):
        video = rng.random((3, frames, size, size)).astype(np.float32)
        save_gif(path / f'ep{i}.gif', video)
        if with_sidecars:
            np.save(path / f'ep{i}.actions.npy',
                    rng.integers(0, 3, (frames,)).astype(np.int64))
            np.save(path / f'ep{i}.rewards.npy',
                    rng.random((frames,)).astype(np.float32))
            np.save(path / f'ep{i}.terminated.npy', np.zeros((frames,), bool))
    return path


TOKENIZER_ARGS = ['--batch-size', '2', '--grad-accum', '2', '--seq-len', '3',
                  '--dim', '16', '--dim-latent', '8', '--patch-size', '8',
                  '--image-size', '16', '--num-latent-tokens', '2',
                  '--encoder-depth', '1', '--decoder-depth', '1',
                  '--time-block-every', '1',
                  '--log-every', '1', '--checkpoint-every', '2',
                  '--sample-every', '2']


def test_cli_tokenizer_folder_dataset_resume_and_logging(tmp_path):
    data = make_gif_folder(tmp_path / 'videos')
    out = tmp_path / 'ckpt'

    main(['train-video-tokenizer', '--dataset', str(data),
          '--output', str(out), '--num-steps', '2', *TOKENIZER_ARGS])

    # step-tagged checkpoint + latest + EMA sub-checkpoint exist
    assert (out / 'ckpt-2' / 'config.json').exists()
    assert (out / 'latest').resolve() == (out / 'ckpt-2').resolve()
    assert (out / 'ckpt-2' / 'ema' / 'config.json').exists()
    # metrics + sample gif written
    metrics = [json.loads(l) for l in (out / 'logs' / 'metrics.jsonl').read_text().splitlines()]
    assert any(m['step'] >= 1 for m in metrics)
    assert list((out / 'logs').glob('recon_*.gif'))

    # resume: continue to step 4; step picks up from the checkpoint
    main(['train-video-tokenizer', '--dataset', str(data),
          '--output', str(out), '--num-steps', '4', *TOKENIZER_ARGS])
    assert (out / 'ckpt-4' / 'config.json').exists()
    assert (out / 'latest').resolve() == (out / 'ckpt-4').resolve()
    meta = json.loads((out / 'ckpt-4' / 'train_meta.json').read_text())
    assert meta['step'] == 4 and meta['has_ema']


def test_cli_tokenizer_glob_dataset(tmp_path):
    data = make_gif_folder(tmp_path / 'videos')
    out = tmp_path / 'ckpt'
    main(['train-video-tokenizer', '--dataset', str(data / 'ep*.gif'),
          '--output', str(out), '--num-steps', '1', *TOKENIZER_ARGS,
          '--sample-every', '100'])
    assert (out / 'latest').exists()


def test_cli_dynamics_from_folder_with_sidecars(tmp_path):
    data = make_gif_folder(tmp_path / 'videos', with_sidecars=True)
    tok_out = tmp_path / 'tok'
    main(['train-video-tokenizer', '--dataset', str(data),
          '--output', str(tok_out), '--num-steps', '1', *TOKENIZER_ARGS,
          '--sample-every', '100'])

    dyn_out = tmp_path / 'dyn'
    dyn_args = ['train-dynamics', '--dataset', str(data),
                '--tokenizer-checkpoint', str(tok_out),
                '--output', str(dyn_out), '--num-steps', '2',
                '--batch-size', '2', '--seq-len', '3',
                '--dim', '16', '--depth', '1', '--num-spatial-tokens', '2',
                '--num-discrete-actions', '3',
                '--log-every', '1', '--checkpoint-every', '2',
                '--sample-every', '2']
    main(dyn_args)
    assert (dyn_out / 'latest').exists()
    assert list((dyn_out / 'logs').glob('dream_*.gif'))

    # resume dynamics too
    main(dyn_args[:dyn_args.index('--num-steps') + 2][:-1] + ['3']
         + dyn_args[dyn_args.index('--num-steps') + 2:])
    meta = json.loads((dyn_out / 'latest' / 'train_meta.json').read_text())
    assert meta['step'] == 3
