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

# Native-binary bootstrap, mirroring the reference's
# (/root/reference/src/daft_exprt/__init__.py:7-20, which PATH-injects
# its bundled REAPER and makes it executable): expose our C++
# pitch_tracker on $PATH and restore the exec bit if an archive
# transfer dropped it. No glibc probe -- the binary builds from source
# in-repo (native/pitch_tracker/).
def _bootstrap_native_bin():
    import os
    import stat
    bin_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bin")
    tracker = os.path.join(bin_dir, "pitch_tracker")
    if os.path.isfile(tracker):
        if not os.access(tracker, os.X_OK):
            try:
                os.chmod(tracker, os.stat(tracker).st_mode
                         | stat.S_IXUSR | stat.S_IXGRP | stat.S_IXOTH)
            except OSError:
                pass
        if bin_dir not in os.environ.get("PATH", "").split(os.pathsep):
            os.environ["PATH"] = \
                bin_dir + os.pathsep + os.environ.get("PATH", "")


_bootstrap_native_bin()
del _bootstrap_native_bin
