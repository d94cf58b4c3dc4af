from dawn_tpu.evaluate.metrics import frechet_distance, diversity, temporal_smoothness
