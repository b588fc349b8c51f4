"""Sample processing: caption cleaning, rating/quality/meta tags, DataTransform."""

from .caption import Rating, age_tag, booru_score_tag, clean_tag_list, how_lewd_is_this, shuffle_tags, source_tag
from .transform import DataTransform

__all__ = [
    "Rating",
    "age_tag",
    "booru_score_tag",
    "clean_tag_list",
    "how_lewd_is_this",
    "shuffle_tags",
    "source_tag",
    "DataTransform",
]
