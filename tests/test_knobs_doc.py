"""docs/knobs.md stays consistent with the code's env-knob defaults.

Round-3 shipped a stale row (`NEUROSIS_FLASH_COST_EST` documented default 0
vs actual 1) that would have burned a future A/B. This test parses the
"Kernel dispatch" table's Default column and checks, for every knob with a
literal 0/1 default, that the source expression reading the knob behaves
identically with the env unset and with the env set to the documented
default — and differently with the opposite value.
"""

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
DOC = REPO / "docs" / "knobs.md"
SRC = REPO / "neurosis_tpu"


def _doc_defaults():
    rows = {}
    in_table = False
    for line in DOC.read_text().splitlines():
        if line.startswith("## "):
            in_table = line.strip() == "## Kernel dispatch"
            continue
        if in_table:
            m = re.match(r"\| `(NEUROSIS_\w+)` \| `?([^|`]+)`? \|", line)
            if m:
                rows[m.group(1)] = m.group(2).strip()
    assert rows, "Kernel dispatch table not found in docs/knobs.md"
    return rows


def _knob_expressions(knob):
    """Source expressions (assignment RHS or if-conditions) reading `knob`."""
    exprs = []
    for path in SRC.rglob("*.py"):
        for line in path.read_text().splitlines():
            if f'os.environ.get("{knob}"' not in line:
                continue
            stripped = line.strip()
            if stripped.startswith("if ") and stripped.endswith(":"):
                exprs.append((path.name, stripped[3:-1]))
            elif "=" in stripped and not stripped.startswith("#"):
                exprs.append((path.name, stripped.split("=", 1)[1].strip()))
    return exprs


class _FakeEnviron(dict):
    def get(self, key, default=None):  # noqa: A003 - mirrors os.environ.get
        return super().get(key, default)


def _eval(expr, env):
    class _FakeOs:
        environ = _FakeEnviron(env)

    return bool(eval(expr, {"os": _FakeOs}))  # noqa: S307 - our own source


# knobs the package reads internally that are NOT a user surface
_INTERNAL = {"NEUROSIS_WORKER"}  # set by prefetch.py for its own spawned workers


def _doc_knob_names():
    return set(re.findall(r"`(NEUROSIS_[A-Z0-9_]+)`", DOC.read_text()))


def _code_knob_names():
    """Every NEUROSIS_* env var read anywhere in the package, bench, or tools."""
    knobs = set()
    roots = [SRC, REPO / "tools", REPO / "bench.py", REPO / "__graft_entry__.py"]
    for root in roots:
        paths = root.rglob("*.py") if root.is_dir() else [root]
        for path in paths:
            for m in re.finditer(r'environ(?:\.get)?\[?\(?"(NEUROSIS_[A-Z0-9_]+)"', path.read_text()):
                knobs.add(m.group(1))
    return knobs


def test_every_code_knob_is_documented():
    """VERDICT r4 #7: the full inventory, not just one table's booleans —
    every NEUROSIS_* env read in the package must have a docs/knobs.md row."""
    undocumented = _code_knob_names() - _doc_knob_names() - _INTERNAL
    assert not undocumented, f"knobs read in code but missing from docs/knobs.md: {sorted(undocumented)}"


def test_every_documented_knob_exists_in_code():
    """The reverse direction: a documented knob nothing reads is a stale row."""
    stale = _doc_knob_names() - _code_knob_names()
    assert not stale, f"knobs documented in docs/knobs.md but never read: {sorted(stale)}"


def test_kernel_knob_defaults_match_docs():
    checked = 0
    for knob, doc_default in _doc_defaults().items():
        if doc_default not in ("0", "1"):
            continue  # e.g. "backend" — dynamic default, not checkable here
        exprs = _knob_expressions(knob)
        assert exprs, f"{knob} documented but never read in neurosis_tpu/"
        other = "1" if doc_default == "0" else "0"
        for fname, expr in exprs:
            unset = _eval(expr, {})
            at_default = _eval(expr, {knob: doc_default})
            at_other = _eval(expr, {knob: other})
            assert unset == at_default, (
                f"{knob} ({fname}): unset behaves like {other}, "
                f"but docs/knobs.md documents default {doc_default}"
            )
            assert at_default != at_other, f"{knob} ({fname}): knob has no effect"
        checked += 1
    assert checked >= 9, f"only {checked} knobs checked — table parse regressed?"
