"""Whitespace / page-artifact cleanup (R5).

Re-implements the computation of
``/root/reference/src/converters/whitespace.rs``:

* artifact regexes (``whitespace.rs:9-30``): ``Page N``, ``- N -``,
  ``[N]``/``(N)``, standalone 1-3-digit numbers, dash/equals separator lines
* ``remove_page_artifacts`` (``whitespace.rs:91-114``)
* ``normalize_whitespace`` — 3+ newlines -> exactly 3 (``whitespace.rs:54-58``)
* ``normalize_horizontal_whitespace`` — collapse 2+ internal spaces while
  preserving leading indentation (``whitespace.rs:284-320``)
* ``cleanup_markdown`` (``whitespace.rs:247-255``) and ``cleanup_plain_text``
  (``whitespace.rs:339-345``)

This module is the reference's own "boilerplate strip" slot; the HTML
boilerplate stripper (``htmlstrip.py``) extends the same slot per the fused
north rule.
"""

from __future__ import annotations

import re

RE_MULTI_NEWLINE = re.compile(r"\n{3,}")
RE_PAGE_NUM = re.compile(r"^Page\s+\d+\s*$", re.M)
RE_DASH_PAGE = re.compile(r"^\s*-\s*\d+\s*-\s*$", re.M)
RE_BRACKET_PAGE = re.compile(r"^\s*[\[\(]\d+[\]\)]\s*$", re.M)
RE_STANDALONE_NUM = re.compile(r"^\s*\d{1,3}\s*$", re.M)
RE_DASH_SEP = re.compile(r"^[\s\-]{5,}$", re.M)
RE_EQUALS_SEP = re.compile(r"^[\s=]{5,}$", re.M)
RE_MULTI_SPACE = re.compile(r" {2,}")


def normalize_whitespace(text: str) -> str:
    """3+ consecutive newlines -> exactly 3 (2 blank lines)."""
    return RE_MULTI_NEWLINE.sub("\n\n\n", text)


def remove_page_artifacts(text: str) -> str:
    """reference whitespace.rs:91-114 (same pattern order)."""
    text = RE_PAGE_NUM.sub("", text)
    text = RE_DASH_PAGE.sub("", text)
    text = RE_BRACKET_PAGE.sub("", text)
    text = RE_STANDALONE_NUM.sub("", text)
    text = RE_DASH_SEP.sub("", text)
    text = RE_EQUALS_SEP.sub("", text)
    return text


def normalize_horizontal_whitespace(text: str) -> str:
    """Collapse 2+ spaces to 1, preserving leading indentation per line
    (reference whitespace.rs:284-320). Joins with '\\n' like the reference's
    line iterator (a sole trailing newline is dropped)."""
    out: list[str] = []
    for line in text.split("\n"):
        stripped = line.lstrip(" ")
        lead = len(line) - len(stripped)
        out.append(" " * lead + RE_MULTI_SPACE.sub(" ", stripped))
    # Rust str::lines() drops a single trailing newline; emulate.
    if text.endswith("\n") and out and out[-1] == "":
        out.pop()
    return "\n".join(out)


def cleanup_markdown(text: str) -> str:
    """reference whitespace.rs:247-255: artifacts -> vertical normalize."""
    return normalize_whitespace(remove_page_artifacts(text))


def cleanup_plain_text(text: str) -> str:
    """reference whitespace.rs:339-345: horizontal -> vertical normalize."""
    return normalize_whitespace(normalize_horizontal_whitespace(text))
