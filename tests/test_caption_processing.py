"""Golden parity: caption/rating/meta processing vs the reference
(dataset/processing/caption/{rating,meta,clean}.py) on input matrices."""

import pathlib as _pl
from datetime import datetime

import pytest

pytestmark = pytest.mark.skipif(
    not _pl.Path("/root/reference/src/neurosis").exists(), reason="reference tree not mounted"
)


def _load_ref():
    import sys
    import types

    sys.path.insert(0, "tests")
    from _reference_loader import _load

    # clean.py imports clean_word from neurosis.dataset.utils
    if "neurosis.dataset.utils" not in sys.modules:
        du = types.ModuleType("neurosis.dataset.utils")

        def clean_word(word_sep, word):
            if isinstance(word, bytes):
                word = word.decode("utf-8")
            return word.replace("_", word_sep).replace(" ", word_sep).strip()

        du.clean_word = clean_word
        sys.modules["neurosis.dataset.utils"] = du
    meta = _load("ref_caption_meta", "dataset/processing/caption/meta.py")
    rating = _load("ref_caption_rating", "dataset/processing/caption/rating.py")
    clean = _load("ref_caption_clean", "dataset/processing/caption/clean.py")
    return meta, rating, clean


def test_booru_score_and_source_and_age_tags():
    meta, _, _ = _load_ref()
    from neurosis_tpu.data.processing.caption import age_tag, booru_score_tag, source_tag

    for up, down in [(200, 0), (160, 10), (120, 0), (80, 0), (30, 0), (10, 0), (0, 0), (-3, 0), (0, 10), (5, 100)]:
        assert booru_score_tag(up, down) == meta.booru_score_tag(up, down), (up, down)

    for src in ["Danbooru2021", "gwern-faces", "e621", "PIXIV", "danbooru"]:
        assert source_tag(src) == meta.source_tag(src)

    for date in ["2005-01-01", "2012-06-15", "2017-03-03", "2021-11-30", "2024-01-01"]:
        assert age_tag(date) == meta.age_tag(date), date
        assert age_tag(datetime.fromisoformat(date)) == meta.age_tag(datetime.fromisoformat(date))


def test_how_lewd_is_this_parity_and_upstream_match_bug():
    """G and S(sensitive tie-break) agree with the reference exactly. For Q/E
    the reference's `case [Rating.Q, Rating.E]` matches a LIST pattern that a
    single Rating never satisfies, so it falls into the unknown-rating branch
    and calls explicit images SFW — an upstream latent match-statement bug.
    We implement the documented intent (Q/E → nsfw) and assert the divergence
    here so it stays a conscious decision."""
    _, ref_rating, _ = _load_ref()
    from neurosis_tpu.data.processing.caption import Rating, how_lewd_is_this

    def scores(g, s, q, e):
        return {Rating.G: g, Rating.S: s, Rating.Q: q, Rating.E: e}

    def ref_scores(g, s, q, e):
        R = ref_rating.Rating
        return {R.G: g, R.S: s, R.Q: q, R.E: e}

    # general: both SFW
    assert how_lewd_is_this(scores(0.9, 0.05, 0.03, 0.02))[0] is None
    assert ref_rating.how_lewd_is_this(ref_scores(0.9, 0.05, 0.03, 0.02))[0] is None

    # sensitive with G dominating the NSFW pair: both SFW
    ours = how_lewd_is_this(scores(0.4, 0.5, 0.05, 0.05))
    ref = ref_rating.how_lewd_is_this(ref_scores(0.4, 0.5, 0.05, 0.05))
    assert ours[0] is None and ref[0] is None
    assert str(ours[1].value) == str(ref[1].value)

    # sensitive with NSFW pair dominating G: both NSFW
    ours = how_lewd_is_this(scores(0.1, 0.5, 0.35, 0.05))
    ref = ref_rating.how_lewd_is_this(ref_scores(0.1, 0.5, 0.35, 0.05))
    assert ours[0] == "nsfw" and ref[0] == "nsfw"

    # explicit: ours → nsfw (documented intent); reference's match bug → SFW
    ours = how_lewd_is_this(scores(0.02, 0.03, 0.05, 0.9))
    ref = ref_rating.how_lewd_is_this(ref_scores(0.02, 0.03, 0.05, 0.9))
    assert ours[0] == "nsfw"
    assert ref[0] is None  # the upstream bug, pinned

    # source rating bumps the score to the confidence floor
    ours = how_lewd_is_this(scores(0.5, 0.2, 0.2, 0.1), src_rating=Rating.E)
    assert ours[0] == "nsfw" and ours[1] == Rating.E


def test_clean_tag_list_parity():
    _, _, ref_clean = _load_ref()
    from neurosis_tpu.data.processing.caption import clean_tag_list

    tags = ["long_hair", " blue  eyes ", "1girl", "very_long_hair"]
    ours = clean_tag_list(list(tags))
    ref = ref_clean.clean_tag_list(list(tags))
    assert list(ours) == list(ref), (ours, ref)
