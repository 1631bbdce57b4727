"""Pretty* / Vertical output rendering (reference src/Processors/Formats/
Impl/PrettyBlockOutputFormat.cpp, PrettyCompactBlockOutputFormat.cpp,
PrettySpaceBlockOutputFormat.cpp, VerticalRowOutputFormat.cpp).

The renderer is pure text: callers pass column display names, per-cell
text, and per-column alignment ('r' for numeric right-alignment, 'l'
otherwise); it returns the clickhouse-client lines.  Headers are bold via
the same ANSI escapes the reference emits.
"""

from __future__ import annotations

BOLD = "\x1b[1m"
RESET = "\x1b[0m"


def _widths(names: list[str], rows: list[list[str]]) -> list[int]:
    w = [len(n) for n in names]
    for r in rows:
        for i, c in enumerate(r):
            if len(c) > w[i]:
                w[i] = len(c)
    return w


def _align(text: str, width: int, align: str) -> str:
    return text.rjust(width) if align == "r" else text.ljust(width)


def render_pretty(
    names: list[str], rows: list[list[str]], aligns: list[str]
) -> list[str]:
    """FORMAT Pretty: heavy box header, light row separators between
    every data row; the whole aligned header cell (padding included) is
    bold."""
    w = _widths(names, rows)
    top = "┏" + "┳".join("━" * (x + 2) for x in w) + "┓"
    head = "┃" + "┃".join(
        f" {BOLD}{_align(n, x, a)}{RESET} "
        for n, x, a in zip(names, w, aligns)
    ) + "┃"
    mid = "┡" + "╇".join("━" * (x + 2) for x in w) + "┩"
    sep = "├" + "┼".join("─" * (x + 2) for x in w) + "┤"
    bot = "└" + "┴".join("─" * (x + 2) for x in w) + "┘"
    out = [top, head, mid]
    for j, r in enumerate(rows):
        if j:
            out.append(sep)
        out.append(
            "│" + "│".join(
                f" {_align(c, x, a)} " for c, x, a in zip(r, w, aligns)
            ) + "│"
        )
    out.append(bot)
    return out


def render_pretty_compact(
    names: list[str], rows: list[list[str]], aligns: list[str]
) -> list[str]:
    """FORMAT PrettyCompact[MonoBlock]: the header is embedded in the top
    border (alignment padding drawn as '─', only the name itself bold)."""
    w = _widths(names, rows)

    def head_cell(n: str, x: int, a: str) -> str:
        pad = x - len(n)
        if a == "r":
            return "─" * (1 + pad) + BOLD + n + RESET + "─"
        return "─" + BOLD + n + RESET + "─" * (1 + pad)

    out = [
        "┌" + "┬".join(
            head_cell(n, x, a) for n, x, a in zip(names, w, aligns)
        ) + "┐"
    ]
    for r in rows:
        out.append(
            "│" + "│".join(
                f" {_align(c, x, a)} " for c, x, a in zip(r, w, aligns)
            ) + "│"
        )
    out.append("└" + "┴".join("─" * (x + 2) for x in w) + "┘")
    return out


def render_pretty_space(
    names: list[str], rows: list[list[str]], aligns: list[str]
) -> list[str]:
    """FORMAT PrettySpace: no borders; one blank line after the header;
    only the name itself bold (padding outside the escapes)."""
    w = _widths(names, rows)

    def head_cell(n: str, x: int, a: str) -> str:
        pad = " " * (x - len(n))
        if a == "r":
            return " " + pad + BOLD + n + RESET + " "
        return " " + BOLD + n + RESET + pad + " "

    head = " ".join(
        head_cell(n, x, a) for n, x, a in zip(names, w, aligns)
    )
    # the reference drops the final header cell's trailing pad space
    out = [head[:-1] if head.endswith(" ") else head, ""]
    for r in rows:
        out.append(
            " ".join(
                f" {_align(c, x, a)} " for c, x, a in zip(r, w, aligns)
            )
        )
    return out


def render_vertical(
    names: list[str], rows: list[list[str]]
) -> list[str]:
    """FORMAT Vertical: Row N:/ ────── header, then `name: value` with
    values aligned past the longest name."""
    out: list[str] = []
    keyw = max((len(n) for n in names), default=0) + 1
    for j, r in enumerate(rows):
        hdr = f"Row {j + 1}:"
        out.append(hdr)
        out.append("─" * len(hdr))
        for n, c in zip(names, r):
            out.append(f"{n}:".ljust(keyw + 1) + c)
        if j + 1 < len(rows):
            out.append("")
    return out


def render(
    fmt: str, names: list[str], rows: list[list[str]], aligns: list[str]
) -> list[str]:
    f = fmt.lower()
    if f in ("prettycompact", "prettycompactmonoblock",
             "prettycompactnoescapes"):
        return render_pretty_compact(names, rows, aligns)
    if f in ("prettyspace", "prettyspacenoescapes"):
        return render_pretty_space(names, rows, aligns)
    if f == "vertical":
        return render_vertical(names, rows)
    return render_pretty(names, rows, aligns)
