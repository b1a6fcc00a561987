from dmel_codec_tpu.dsp.mel import hann_window, mel_filterbank
from dmel_codec_tpu.dsp.spectrogram import LogMelSpectrogram, log_mel_spectrogram

__all__ = [
    "hann_window",
    "mel_filterbank",
    "LogMelSpectrogram",
    "log_mel_spectrogram",
]
