"""mmpl_tpu: TPU-native macro-from-micro planned long-video generation.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of
Tele-AI/MMPL (chunk-wise autoregressive long video generation on the Wan2.1
model family).  See SURVEY.md at the repo root for the reference layer map.
"""

__version__ = "0.1.0"
