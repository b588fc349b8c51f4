from .misc import append_dims, append_zero, count_params, str_to_dtype, batched, get_nested_attribute
from .sgm import expand_dims_like, log_txt_as_img
from .strings import StringArray, freeze_slice
from .summary import summarize

__all__ = [
    "append_dims",
    "append_zero",
    "count_params",
    "str_to_dtype",
    "batched",
    "get_nested_attribute",
    "expand_dims_like",
    "log_txt_as_img",
    "StringArray",
    "freeze_slice",
    "summarize",
]
