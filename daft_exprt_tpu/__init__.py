"""Daft-Exprt TPU: a TPU-native expressive-TTS framework.

A from-scratch JAX/XLA/Pallas rebuild of the Daft-Exprt acoustic model
(Zaidi, Seute, van Niekerk, Carbonneau -- arXiv:2108.02271): a
FastSpeech2-style phoneme->mel model where a prosody encoder reads a
reference utterance and emits FiLM parameters that condition every other
module, with an adversarial speaker classifier behind a gradient-reversal
layer for speaker/prosody disentanglement.

Reference behavior (capability parity target): ubisoft/ubisoft-laforge-daft-exprt.
This package is NOT a port -- the compute path is pure-functional JAX
compiled by XLA for TPU (static bucketed shapes, masked kernels, pjit/
shard_map data parallelism over a device mesh, Pallas kernels for the hot
ops), and host-side tooling (pitch extraction) is native C++.
"""

__version__ = "0.1.0"
