"""Sampling pipelines (pipeline/__init__.py parity)."""

from .bidirectional_inference import (BidirectionalDiffusionInferencePipeline,
                                      BidirectionalInferencePipeline)
from .causal_diffusion_inference import CausalDiffusionInferencePipeline
from .causal_inference import CausalInferencePipeline
from .fps_inference import CausalFPSInferencePipeline

__all__ = [
    "CausalFPSInferencePipeline",
    "CausalInferencePipeline",
    "CausalDiffusionInferencePipeline",
    "BidirectionalDiffusionInferencePipeline",
    "BidirectionalInferencePipeline",
]
