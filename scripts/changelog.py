"""Changelog draft generator — the git-cliff analog (reference: cliff.toml).

The reference maintains its CHANGELOG with git-cliff over conventional
commits (`/root/reference/cliff.toml`).  This repo's history is milestone
commits rather than strict conventional commits, so the generator groups by
a small prefix heuristic and emits a draft stanza to paste into
CHANGELOG.md (which stays hand-curated, like the reference's release notes).

Usage:
    python scripts/changelog.py [SINCE_REF] [--version 0.3.0]
"""

import argparse
import re
import subprocess

GROUPS = [
    ("Features", re.compile(r"^(feat|add|new)\b", re.I)),
    ("Fixes", re.compile(r"^(fix|bug|repair)\b", re.I)),
    ("Performance", re.compile(
        r"^(perf|speed|retune|bound|optimi[sz]e)|MiB/s|MB/s|\dx\b", re.I)),
    ("Documentation", re.compile(r"^(doc|docs|record|readme)\b", re.I)),
    ("Testing", re.compile(r"^(test|pin|ci)\b", re.I)),
]
FALLBACK = "Changed"
SKIP = re.compile(r"^(round \d+:|merge\b|wip\b)", re.I)


def commits_since(ref: str | None) -> list[str]:
    rng = f"{ref}..HEAD" if ref else "HEAD"
    out = subprocess.run(
        ["git", "log", "--pretty=%s", rng],
        check=True, capture_output=True, text=True,
    ).stdout
    return [line for line in out.splitlines() if line.strip()]


def render(subjects: list[str], version: str) -> str:
    sections: dict[str, list[str]] = {}
    for s in subjects:
        if SKIP.match(s):
            continue
        for title, pat in GROUPS:
            if pat.search(s):
                sections.setdefault(title, []).append(s)
                break
        else:
            sections.setdefault(FALLBACK, []).append(s)
    lines = [f"## {version} (draft)", ""]
    for title, _ in GROUPS + [(FALLBACK, None)]:
        if title in sections:
            lines.append(f"### {title}")
            lines += [f"- {s}" for s in sections[title]]
            lines.append("")
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("since", nargs="?", default=None,
                    help="ref to diff from (e.g. a release commit)")
    ap.add_argument("--version", default="unreleased")
    args = ap.parse_args()
    print(render(commits_since(args.since), args.version))


if __name__ == "__main__":
    main()
