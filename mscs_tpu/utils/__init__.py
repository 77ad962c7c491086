from mscs_tpu.utils.logger import Logger, ScalarWriter, printlog

__all__ = ["Logger", "ScalarWriter", "printlog"]
