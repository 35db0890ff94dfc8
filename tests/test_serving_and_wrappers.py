"""Snake env, record wrappers, world-model-as-env, web server, checkpointing,
CLI surface."""
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreamer4_tpu.data.replay_buffer import ReplayBuffer
from dreamer4_tpu.envs.snake import SnakeEnv
from dreamer4_tpu.envs.wrappers import (ActionTransformWrapper,
                                        RecordToFolderEnvWrapper,
                                        RecordToReplayBufferEnvWrapper)
from dreamer4_tpu.envs.world_model_env import DynamicsWorldModelWrapper
from dreamer4_tpu.models.world_model import DynamicsWorldModel
from dreamer4_tpu.serve.server import WebEnvServer, encode_png


def test_snake_env():
    env = SnakeEnv(grid_size=4, max_steps=20, seed=0)
    obs, _ = env.reset(seed=0)
    assert obs.shape == (3, 8, 8)
    total_reward = 0.0
    for _ in range(20):
        obs, reward, terminated, truncated, info = env.step(int(np.random.default_rng(0).integers(4)))
        total_reward += reward
        if terminated or truncated:
            break
    assert obs.shape == (3, 8, 8)
    assert 'apples' in info


def test_record_to_replay_buffer(tmp_path):
    buf = ReplayBuffer(
        tmp_path / 'buf', max_episodes=4, max_timesteps=25,
        fields=dict(video=('uint8', (3, 8, 8)), rewards='float',
                    terminated='bool', discrete_actions='int'))
    env = RecordToReplayBufferEnvWrapper(SnakeEnv(grid_size=4, seed=0), buf)

    for ep in range(2):
        env.reset(seed=ep)
        for t in range(20):
            obs, reward, terminated, truncated, info = env.parse_step(env.step(t % 4))
            if terminated or truncated:
                break
    env.close()

    assert len(buf) >= 2
    episode = buf.get_episode(0)
    assert episode['video'].shape[1:] == (3, 8, 8)
    assert episode['video'].max() > 0


def test_record_to_folder(tmp_path):
    env = RecordToFolderEnvWrapper(SnakeEnv(grid_size=4, seed=0), tmp_path / 'eps')
    env.reset(seed=0)
    for t in range(5):
        out = env.step(t % 4)
        if out[2] or out[3]:
            break
    env.close()
    videos = list((tmp_path / 'eps').glob('*.video.npy'))
    assert len(videos) >= 1
    v = np.load(videos[0])
    assert v.shape[0] == 3


def test_action_transform_wrapper():
    calls = []

    class Env:
        def reset(self, **kw):
            return np.zeros(3), {}
        def step(self, action):
            calls.append(action)
            return np.zeros(3), 0.0, False, False, {}

    env = ActionTransformWrapper(Env(), transform_fn=lambda a: a * 2.0, clip=(-1, 1))
    env.reset()
    env.step(np.array([0.4, -3.0]))
    np.testing.assert_allclose(calls[0], [0.8, -1.0])


@pytest.fixture(scope='module')
def wm_and_vars():
    model = DynamicsWorldModel(
        dim=16, dim_latent=8, num_latent_tokens=4, max_steps=8, depth=1,
        time_block_every=1, num_spatial_tokens=4, num_discrete_actions=(4,),
        attn_dim_head=8, attn_heads=2, multi_token_pred_len=2, num_register_tokens=2)
    latents = jnp.zeros((1, 3, 4, 8))
    rngs = {'params': jax.random.PRNGKey(0), 'sample': jax.random.PRNGKey(1)}
    variables = model.init(rngs, latents=latents, shortcut_train=False,
                           rewards=jnp.zeros((1, 3)),
                           discrete_actions=jnp.zeros((1, 2, 1), jnp.int32))
    return model, variables


def test_world_model_as_env(wm_and_vars):
    model, variables = wm_and_vars
    env = DynamicsWorldModelWrapper(model, variables, num_steps=2, max_timesteps=4)
    obs, info = env.reset(seed=0)
    assert obs.shape == (1, 4, 8)  # latent obs (no tokenizer)
    for a in range(3):
        obs, reward, terminated, truncated, info = env.step(a % 4)
        assert np.isfinite(reward)
    assert truncated or terminated or env._t == 3


def test_png_and_server():
    img = np.random.default_rng(0).random((3, 8, 8)).astype(np.float32)
    png = encode_png(img)
    assert png[:8] == b'\x89PNG\r\n\x1a\n'

    server = WebEnvServer(SnakeEnv(grid_size=4, seed=0), port=18731, host='127.0.0.1')
    thread = threading.Thread(target=server.httpd.serve_forever, daemon=True)
    thread.start()
    try:
        req = urllib.request.Request('http://127.0.0.1:18731/reset', method='POST')
        with urllib.request.urlopen(req, timeout=5) as r:
            out = json.loads(r.read())
        assert 'frame' in out

        req = urllib.request.Request(
            'http://127.0.0.1:18731/step', method='POST',
            data=json.dumps({'action': 1}).encode(),
            headers={'Content-Type': 'application/json'})
        with urllib.request.urlopen(req, timeout=5) as r:
            out = json.loads(r.read())
        assert 'reward' in out and 'frame' in out

        assert 'done' in out and 'steps_left' in out  # UI status fields

        # the interactive play page renders and drives the JSON protocol
        with urllib.request.urlopen('http://127.0.0.1:18731/', timeout=5) as r:
            page = r.read().decode()
        assert 'dreamer4_tpu' in page
        for marker in ("post('/step'", "post('/reset'", 'data.frame',
                       'KEYMAP', 'steps_left'):
            assert marker in page, f'play.html missing {marker}'
    finally:
        server.shutdown()


def test_checkpoint_roundtrip(tmp_path, wm_and_vars):
    from dreamer4_tpu.train.checkpoint import load_model, save_model

    model, variables = wm_and_vars
    save_model(tmp_path / 'ckpt', model, variables, extra={'step': 7})

    model2, variables2 = load_model(tmp_path / 'ckpt', DynamicsWorldModel)
    assert model2.dim == model.dim
    assert model2.num_discrete_actions == (4,)

    # parameter trees identical
    flat1 = jax.tree_util.tree_leaves(variables['params'])
    flat2 = jax.tree_util.tree_leaves(variables2['params'])
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # loaded model runs
    latents = jnp.zeros((1, 2, 4, 8))
    pred = model2.apply(variables2, latents=latents, signal_levels=7, step_sizes=4,
                        latent_is_noised=True, rngs={'sample': jax.random.PRNGKey(0)})
    assert pred.flow.shape == (1, 2, 1, 4, 8)  # (b, t, views, n, d)


def test_cli_help():
    from dreamer4_tpu.cli import main
    assert main([]) == 0
    assert main(['bogus']) == 1


def test_inspect_server(tmp_path):
    import numpy as np

    from dreamer4_tpu.serve.server import InspectReplayBufferServer

    buf = ReplayBuffer(
        tmp_path / 'ibuf', max_episodes=4, max_timesteps=10,
        fields=dict(video=('uint8', (3, 8, 8)), rewards='float', terminated='bool',
                    actions=('int', (1,))))
    rng = np.random.default_rng(0)
    with buf.one_episode():
        for t in range(4):
            buf.store(video=(rng.random((3, 8, 8)) * 255).astype('uint8'),
                      rewards=float(t), terminated=False,
                      actions=np.array([t % 4]))

    server = InspectReplayBufferServer(buf, port=18733, host='127.0.0.1')
    thread = threading.Thread(target=server.httpd.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen('http://127.0.0.1:18733/api/stats', timeout=5) as r:
            stats = json.loads(r.read())
        assert stats['num_episodes'] == 1
        with urllib.request.urlopen('http://127.0.0.1:18733/api/episodes', timeout=5) as r:
            eps = json.loads(r.read())
        assert eps['episodes'][0]['length'] == 4
        assert eps['episodes'][0]['total_reward'] == 6.0
        with urllib.request.urlopen('http://127.0.0.1:18733/api/episode/0', timeout=5) as r:
            ep = json.loads(r.read())
        assert len(ep['frames']) == 4
        # non-video per-frame fields ride along for the UI's field cards
        assert ep['fields']['actions'] == [[0], [1], [2], [3]]
        assert ep['rewards'] == [0.0, 1.0, 2.0, 3.0]

        # the episode-browser inspector page renders against this API
        with urllib.request.urlopen('http://127.0.0.1:18733/', timeout=5) as r:
            page = r.read().decode()
        assert 'dreamer4_tpu' in page
        for marker in ("'/api/stats'", "'/api/episodes'", "'/api/episode/'",
                       'scrub', 'playpause', 'ep.fields'):
            assert marker in page, f'inspect.html missing {marker}'
    finally:
        server.shutdown()


def test_metric_logger(tmp_path):
    import numpy as np

    from dreamer4_tpu.train.logging import MetricLogger, timeit

    logger = MetricLogger(tmp_path / 'logs', use_tensorboard=False)
    logger.log(0, loss=1.5, reward=0.2)
    logger.log(1, loss=1.2)
    logger.log_video(1, 'sample', np.random.default_rng(0).random((2, 3, 2, 4, 4)))
    logger.close()

    lines = (tmp_path / 'logs' / 'metrics.jsonl').read_text().strip().split('\n')
    assert len(lines) == 2
    assert json.loads(lines[0])['loss'] == 1.5
    assert list((tmp_path / 'logs').glob('sample_*.gif'))

    import jax.numpy as jnp
    dt = timeit(jax.jit(lambda x: x * 2), jnp.ones((8, 8)), iters=2)
    assert dt > 0
