"""NATSpeech pitch_utils shim: the reference imports f0_to_coarse from its
(external, not-in-repo) utils.commons package. dawn_tpu's own implementation
is the port of that function; the parity test compares the mel path, which
never calls this."""

from dawn_tpu.pipeline.mel_f0 import f0_to_coarse  # noqa: F401
