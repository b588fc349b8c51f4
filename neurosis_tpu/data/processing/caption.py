"""Caption/tag processing (parity: dataset/processing/caption/{clean,rating,meta}.py).

Note: the reference additionally ships a dataset-specific tag-remapping function
for certain character tags (rating.py:79-133); it is intentionally not
reproduced here — it is a content-policy decision about a specific dataset, not
framework functionality.
"""

from __future__ import annotations

from datetime import datetime
from enum import Enum
from typing import Optional, Sequence

import numpy as np

from ..utils import clean_word


class Rating(str, Enum):
    """Booru-style rating classes (rating.py:10-16)."""

    G = "general"
    S = "sensitive"
    Q = "questionable"
    E = "explicit"


def shuffle_tags(tags: Sequence[str], keep: Optional[int] = None, rng=None) -> list[str]:
    """Shuffle with optional fixed prefix (clean.py:10-32)."""
    rng = rng or np.random.default_rng()
    tags = list(tags)
    if keep is None or keep == 0:
        return [tags[i] for i in rng.permutation(len(tags))]
    if 0 < keep < len(tags):
        tail = tags[keep:]
        return tags[:keep] + [tail[i] for i in rng.permutation(len(tail))]
    return tags


def clean_tag_list(
    tags: Sequence[str],
    word_sep: str = "_",
    shuffle: bool = False,
    keep: Optional[int] = None,
    rng=None,
) -> list[str]:
    """Decode/normalize/strip each tag, optionally shuffle (clean.py:35-61)."""
    tags = [clean_word(word_sep, x) for x in tags]
    if shuffle:
        tags = shuffle_tags(tags, keep=keep, rng=rng)
    return tags


def how_lewd_is_this(
    scores: dict,
    src_rating: Optional[Rating] = None,
    sfw_tag: Optional[str] = None,
    nsfw_tag: Optional[str] = "nsfw",
    source_confidence: float = 0.75,
) -> tuple[Optional[str], Rating]:
    """Classifier scores (+ optional source rating) → (tag, Rating)
    (rating.py:19-76). 'sensitive' ties break on G vs max(Q, E)."""
    scores = dict(scores)
    if src_rating is not None:
        scores[src_rating] = max(scores.get(src_rating, 0.0), source_confidence)

    rating = Rating(max(scores, key=scores.get))
    if rating == Rating.G:
        return sfw_tag, rating
    if rating == Rating.S:
        g = scores.get(Rating.G, scores.get("general", 0.0))
        q = scores.get(Rating.Q, scores.get("questionable", 0.0))
        e = scores.get(Rating.E, scores.get("explicit", 0.0))
        return (sfw_tag, rating) if g > max(q, e) else (nsfw_tag, rating)
    if rating in (Rating.Q, Rating.E):
        return nsfw_tag, rating
    return sfw_tag, rating


def booru_score_tag(score_up: int, score_down: int = 0) -> Optional[str]:
    """Up/down score → quality tag (meta.py:5-26)."""
    score = score_up - score_down
    if score >= 150:
        return "masterpiece"
    if score >= 100:
        return "best quality"
    if score >= 75:
        return "high quality"
    if score >= 25:
        return "medium quality"
    if score >= 0:
        return "normal quality"
    if score >= -5:
        return "low quality"
    return "worst quality"


def source_tag(source: str) -> str:
    """Normalize source names (meta.py:29-33)."""
    source = source.lower()
    if source.startswith("danbooru") or "gwern" in source:
        return "danbooru"
    return source


def age_tag(created_at, auto_range: bool = False) -> str:
    """Creation date → age tag (meta.py:36-48)."""
    ref_year = datetime.now().year if auto_range else 2025
    if not isinstance(created_at, datetime):
        created_at = datetime.fromisoformat(created_at)
    year = created_at.year
    if year < ref_year - 15:
        return "oldest"
    if year < ref_year - 10:
        return "old"
    if year < ref_year - 5:
        return "new"
    return "newest"
