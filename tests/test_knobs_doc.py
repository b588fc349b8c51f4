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
