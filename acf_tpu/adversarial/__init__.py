from acf_tpu.adversarial.popularity import PopularityAdversarial  # noqa: F401
