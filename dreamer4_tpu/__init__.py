"""dreamer4_tpu — a TPU-native (JAX / XLA / Pallas / pjit) Dreamer 4 framework.

Built from scratch with the capabilities of lucidrains/dreamer4 (the reference
implementation), re-designed TPU-first: functional core, explicit PRNG keys,
static-shape caches, pjit/GSPMD sharding, Pallas kernels on the hot paths.

Public surface mirrors the reference package exports
(`dreamer4/__init__.py:1-16`).
"""

__version__ = '0.1.0'

from .models.tokenizer import VideoTokenizer, VideoDecoderNetwork
from .models.world_model import DynamicsWorldModel
from .models.transformer import AxialSpaceTimeTransformer
from .models.generate import generate
from .models.rl import rl_losses, ReturnStats
from .nn.activations import register_activation
from .ops.codecs import register_reward_encoder
from .data.experience import Experience, combine_experiences
from .data.replay_buffer import ReplayBuffer
from .train.trainers import (
    TokenizerTrainer,
    BehaviorCloneTrainer,
    DreamTrainer,
    SimTrainer,
)
from .envs.interact import EnvInteractor, interact_with_env
from .envs.world_model_env import DynamicsWorldModelWrapper

__all__ = [
    'VideoTokenizer',
    'VideoDecoderNetwork',
    'DynamicsWorldModel',
    'AxialSpaceTimeTransformer',
    'generate',
    'rl_losses',
    'ReturnStats',
    'register_activation',
    'register_reward_encoder',
    'Experience',
    'combine_experiences',
    'ReplayBuffer',
    'TokenizerTrainer',
    'BehaviorCloneTrainer',
    'DreamTrainer',
    'SimTrainer',
    'EnvInteractor',
    'interact_with_env',
    'DynamicsWorldModelWrapper',
]
