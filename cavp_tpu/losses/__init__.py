"""Loss zoo (reference ``loss/``).

Active training objective everywhere in the reference:
``loss = l_ce + l_ctr_av`` (trainer_cavp_avss_image.py:222).
"""

from cavp_tpu.losses.ce import cross_entropy, multilabel_soft_margin
from cavp_tpu.losses.contrast_extra import (
    av_contrast_loss,
    pixel_contrast_loss,
    supcon_loss,
)
from cavp_tpu.losses.corocl import corocl_loss
from cavp_tpu.losses.ohem import ohem_cross_entropy

__all__ = [
    "cross_entropy",
    "multilabel_soft_margin",
    "corocl_loss",
    "supcon_loss",
    "av_contrast_loss",
    "pixel_contrast_loss",
    "ohem_cross_entropy",
]
