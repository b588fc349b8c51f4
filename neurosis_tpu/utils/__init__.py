from .misc import append_dims, append_zero, count_params, str_to_dtype, batched, get_nested_attribute

__all__ = [
    "append_dims",
    "append_zero",
    "count_params",
    "str_to_dtype",
    "batched",
    "get_nested_attribute",
]
