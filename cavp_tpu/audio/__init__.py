from cavp_tpu.audio.functional import (
    amp_from_db,
    db_from_amp,
    normalize_spec,
    unnormalize_spec,
)
from cavp_tpu.audio.mel import (
    mel_spectrogram,
    preprocess_audio,
    vggish_log_mel,
    waveform_to_examples,
)

__all__ = [
    "db_from_amp",
    "amp_from_db",
    "normalize_spec",
    "unnormalize_spec",
    "mel_spectrogram",
    "preprocess_audio",
    "vggish_log_mel",
    "waveform_to_examples",
]
