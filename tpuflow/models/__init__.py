"""Model layer: LF conditioning encoder, ConvLSTM recurrence, TM-Glow.

Parity: SURVEY.md §2 rows "LF conditioning encoder", "Conditional
ConvLSTM recurrence", "TM-Glow model" (arXiv:2006.04731 §3).
"""

from tpuflow.models.lf_encoder import LFEncoder
from tpuflow.models.conv_lstm import ConvLSTMCell
from tpuflow.models.glow import GlowStep, MultiScaleGlow
from tpuflow.models.tmglow import TMGlow, init_lstm_state

__all__ = [
    "LFEncoder",
    "ConvLSTMCell",
    "GlowStep",
    "MultiScaleGlow",
    "TMGlow",
    "init_lstm_state",
]
