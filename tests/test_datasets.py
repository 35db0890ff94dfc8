"""Datasets / video IO / augmentation tests (mirrors reference dataset
sections of trainers tests)."""
import numpy as np
import pytest

from dreamer4_tpu.data.datasets import (VideoDataset, VideoDatasetFromReplayBuffer,
                                        VideoTrajectoryDataset, batch_iterator,
                                        collate, pixel_shift_aug,
                                        randomly_apply_aug,
                                        sample_video_and_actions)
from dreamer4_tpu.data.replay_buffer import ReplayBuffer
from dreamer4_tpu.data.video_io import load_video, save_gif, save_video, video_grid


@pytest.fixture()
def video_folder(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(3):
        video = rng.random((3, 4 + i, 16, 16)).astype(np.float32)
        save_gif(tmp_path / f'vid_{i}.gif', video)
    return tmp_path


def test_gif_roundtrip(tmp_path):
    video = np.random.default_rng(0).random((3, 5, 8, 8)).astype(np.float32)
    save_gif(tmp_path / 'v.gif', video)
    loaded = load_video(tmp_path / 'v.gif')
    assert loaded.shape == (3, 5, 8, 8)
    # gif palette quantizes heavily; just check gross correlation
    assert np.corrcoef(video.ravel(), loaded.ravel())[0, 1] > 0.7


def _structured_video(t=5, size=16):
    """Moving bright square — survives lossy codecs, unlike noise."""
    video = np.zeros((3, t, size, size), np.float32)
    color = np.array([0.9, 0.6, 0.2], np.float32)
    for i in range(t):
        x = (2 * i) % (size - 6)
        video[:, i, x:x + 6, x:x + 6] = color[:, None, None]
    return video


@pytest.mark.parametrize('ext', ['mp4', 'avi'])
def test_mp4_roundtrip(tmp_path, ext):
    pytest.importorskip('cv2')
    video = _structured_video()
    save_video(tmp_path / f'v.{ext}', video)
    loaded = load_video(tmp_path / f'v.{ext}')
    assert loaded.shape == (3, 5, 16, 16)
    # lossy codecs; check gross correlation
    assert np.corrcoef(video.ravel(), loaded.ravel())[0, 1] > 0.7
    resized = load_video(tmp_path / f'v.{ext}', image_size=(8, 8))
    assert resized.shape == (3, 5, 8, 8)


def test_mp4_video_dataset(tmp_path):
    pytest.importorskip('cv2')
    for i in range(2):
        save_video(tmp_path / f'vid_{i}.mp4', _structured_video(t=4 + i))
    ds = VideoDataset(tmp_path, num_frames=4)
    assert len(ds) == 2
    assert ds[0]['video'].shape == (3, 4, 16, 16)
    # glob-pattern resolution also picks up mp4
    ds2 = VideoDataset(tmp_path / '*.mp4', num_frames=4)
    assert len(ds2) == 2


def test_mp4_trajectory_dataset(tmp_path):
    pytest.importorskip('cv2')
    rng = np.random.default_rng(0)
    save_video(tmp_path / 'ep0.mp4', _structured_video(t=6))
    np.save(tmp_path / 'ep0.actions.npy', rng.integers(0, 4, size=(5,)))
    np.save(tmp_path / 'ep0.rewards.npy', rng.random(6).astype(np.float32))
    np.save(tmp_path / 'ep0.terminated.npy', np.zeros(6, bool))
    ds = VideoTrajectoryDataset(tmp_path, num_frames=4)
    item = ds[0]
    assert item['video'].shape == (3, 4, 16, 16)
    assert item['actions'].shape[0] == 3


def test_record_to_folder_mp4(tmp_path):
    pytest.importorskip('cv2')
    from dreamer4_tpu.envs.mocks import MockEnv
    from dreamer4_tpu.envs.wrappers import RecordToFolderEnvWrapper

    env = RecordToFolderEnvWrapper(
        MockEnv(image_size=(16, 16), terminate_prob=0.0, truncate_prob=0.0),
        tmp_path, video_format='mp4')
    env.reset()
    for _ in range(4):
        _, _, terminated, truncated, _ = env.parse_step(env.step(0))
        if terminated or truncated:
            break
    env.close()
    assert list(tmp_path.glob('episode_*.mp4')), 'no mp4 episode written'
    ds = VideoTrajectoryDataset(tmp_path, num_frames=2)
    assert ds[0]['video'].shape[0] == 3


def test_video_dataset(video_folder):
    ds = VideoDataset(video_folder, num_frames=4)
    assert len(ds) == 3
    item = ds[0]
    assert item['video'].shape == (3, 4, 16, 16)
    assert item['lens'] <= 4

    batch = next(batch_iterator(ds, batch_size=2))
    assert batch['video'].shape == (2, 3, 4, 16, 16)
    assert batch['lens'].shape == (2,)


def test_trajectory_dataset(tmp_path):
    rng = np.random.default_rng(0)
    video = rng.random((3, 6, 8, 8)).astype(np.float32)
    np.save(tmp_path / 'ep0.video.npy', video)
    np.save(tmp_path / 'ep0.actions.npy', rng.integers(0, 4, size=(5,)))
    np.save(tmp_path / 'ep0.rewards.npy', rng.random(6).astype(np.float32))
    np.save(tmp_path / 'ep0.terminated.npy', np.zeros(6, bool))

    ds = VideoTrajectoryDataset(tmp_path, num_frames=4)
    item = ds[0]
    assert item['video'].shape == (3, 4, 8, 8)
    assert item['actions'].shape[0] == 3   # T-1 actions for T frames
    assert item['rewards'].shape[0] == 4


def test_window_alignment():
    rng = np.random.default_rng(0)
    # frame index encoded in the pixel values; action i leads frame i -> i+1
    video = np.broadcast_to(np.arange(10, dtype=np.float32)[None, :, None, None],
                            (1, 10, 2, 2)).copy()
    actions = np.arange(9)
    item = sample_video_and_actions(dict(video=video, actions=actions), 4, rng)
    first_frame = int(item['video'][0, 0, 0, 0])
    assert item['actions'][0] == first_frame  # action aligned with its frame


def test_replay_buffer_dataset(tmp_path):
    buf = ReplayBuffer(tmp_path / 'buf', max_episodes=2, max_timesteps=8,
                       fields=dict(video=('uint8', (3, 8, 8)), rewards='float',
                                   terminated='bool', discrete_actions='int'))
    rng = np.random.default_rng(0)
    with buf.one_episode():
        for t in range(5):
            buf.store(video=(rng.random((3, 8, 8)) * 255).astype(np.uint8),
                      rewards=1.0, terminated=False, discrete_actions=t % 4)

    ds = VideoDatasetFromReplayBuffer(buf, num_frames=4)
    item = ds[0]
    assert item['video'].shape == (3, 4, 8, 8)
    assert item['video'].max() <= 1.0
    assert item['actions'].shape[0] == 3


def test_augmentation():
    rng = np.random.default_rng(0)
    video = rng.random((2, 3, 2, 8, 8)).astype(np.float32)
    shifted = pixel_shift_aug(rng, video)
    assert shifted.shape == video.shape

    _, aug_id = randomly_apply_aug(np.random.default_rng(1), video, prob=1.0)
    assert aug_id == 2
    _, aug_id = randomly_apply_aug(np.random.default_rng(1), video, prob=0.0)
    assert aug_id == 1


def test_video_grid():
    videos = np.random.default_rng(0).random((5, 3, 2, 4, 4)).astype(np.float32)
    grid = video_grid(videos)
    assert grid.shape == (3, 2, 8, 12)  # 2 rows x 3 cols
