def multiprocess_run_tqdm(*a, **k):  # pragma: no cover
    raise NotImplementedError("shim: batch driver not used in tests")
