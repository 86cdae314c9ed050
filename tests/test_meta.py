"""Suite-documentation honesty (VERDICT r3 weak #7 / next #10).

CLAUDE.md documents the test-suite shape (counts, smoke subset, timing
class); those claims drifted once already (r2). This meta-test pins the
MACHINE-CHECKABLE parts — test counts and the slow-marker split — to the
documented values so any drift fails the suite instead of rotting the
docs. Wall-clock timings cannot be asserted from inside the run; they are
re-measured and updated in CLAUDE.md each round (last: round 4).
"""

import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _collect(extra):
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q",
         "-p", "no:cacheprovider", *extra],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    m = re.search(r"(\d+)(?:/(\d+))? tests? collected", out.stdout)
    assert m, out.stdout[-500:]
    return int(m.group(1)), int(m.group(2) or m.group(1))


def test_counts_match_claude_md():
    doc = (REPO / "CLAUDE.md").read_text()
    m = re.search(r"(\d+) tests\)", doc)
    assert m, "CLAUDE.md must state the full test count as 'NNN tests)'"
    documented_total = int(m.group(1))
    selected, total = _collect([])
    # exact totals drift with every added test: allow the doc to lag by a
    # small margin, fail loudly when it rots
    assert abs(total - documented_total) <= 25, (
        f"CLAUDE.md documents {documented_total} tests, suite has {total} "
        "— update the Commands section"
    )
    smoke, _ = _collect(["-m", "not slow"])
    assert smoke < total, "the slow marker must deselect something"
    assert total - smoke >= 50, (
        "the slow subset collapsed; acceptance tests lost their marker?"
    )
