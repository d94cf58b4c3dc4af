"""parselmouth import stub: the reference's extract_f0 path (Praat
to_pitch_ac) needs the real Praat binary; the mel parity test never calls
it (the dawn_tpu F0 tracker is a documented deviation, DEVIATIONS.md)."""


class Sound:  # pragma: no cover
    def __init__(self, *a, **k):
        raise NotImplementedError("parselmouth shim: Praat not available")
