from cavp_tpu.models.attn import Attention, Block, CrossAttention, PatchEmbed
from cavp_tpu.models.audio_nets import AudioModel, AudioResNet18, VGGAudio
from cavp_tpu.models.cavp import CAVP, LATENT_DIM, VisualModel
from cavp_tpu.models.deeplabv3p import ASPP, DeepLabV3Plus, Upsampling
from cavp_tpu.models.resnet import ResNet

__all__ = [
    "CAVP",
    "VisualModel",
    "LATENT_DIM",
    "ResNet",
    "DeepLabV3Plus",
    "ASPP",
    "Upsampling",
    "CrossAttention",
    "Attention",
    "Block",
    "PatchEmbed",
    "AudioModel",
    "VGGAudio",
    "AudioResNet18",
]
