from acf_tpu.utils.io import OutputWriter, write2file, prediction2file  # noqa: F401
