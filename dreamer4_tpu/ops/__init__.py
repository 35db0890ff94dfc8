from .utils import (
    exists,
    default,
    l2norm,
    l1norm,
    softclamp,
    lens_to_mask,
    masked_mean,
    z_score,
    frac_gradient,
    straight_through,
    orthogonal_loss,
    ramp_weight,
    symlog,
    symexp,
)
from .codecs import SymExpTwoHot, HLGauss, REWARD_ENCODERS, register_reward_encoder, get_reward_encoder
from .scan import calc_gae, linear_recurrence_scan
from .mtp import create_multi_token_prediction_targets
from .losses import init_loss_normalizer, apply_loss_normalizer, sigreg
