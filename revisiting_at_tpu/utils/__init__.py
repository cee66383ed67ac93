from .flops import forward_flops, param_count, sizeof_fmt
from .logging import EvalLogger, RunLogger, make_run_name

__all__ = [
    "forward_flops",
    "param_count",
    "sizeof_fmt",
    "EvalLogger",
    "RunLogger",
    "make_run_name",
]
