from .run_dir import make_save_dir, dump_config
from .meters import AverageMeter, ProgressMeter
from .logging import MetricWriter
from .cache import compiler_options_from_cfg, enable_compile_cache

__all__ = ["make_save_dir", "dump_config", "AverageMeter", "ProgressMeter",
           "MetricWriter", "enable_compile_cache",
           "compiler_options_from_cfg"]
