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
    names: list[str], rows: list[list[str]], aligns: list[str],
    escapes: bool = True,
) -> list[str]:
    """FORMAT PrettySpace[NoEscapes]: no borders; one blank line after
    the header; only the name itself bold (padding outside the escapes;
    the NoEscapes variant drops the ANSI codes, keeping the layout)."""
    w = _widths(names, rows)
    bold, reset = (BOLD, RESET) if escapes else ("", "")

    def head_cell(n: str, x: int, a: str) -> str:
        pad = " " * (x - len(n))
        if a == "r":
            return " " + pad + bold + n + reset + " "
        return " " + bold + n + reset + pad + " "

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
        return render_pretty_space(
            names, rows, aligns, escapes=(f == "prettyspace")
        )
    if f == "vertical":
        return render_vertical(names, rows)
    return render_pretty(names, rows, aligns)


def render_xml(
    names: list, ch_types: list, rows: list, extremes: bool,
) -> list[str]:
    """FORMAT XML (reference src/Processors/Formats/Impl/
    XMLRowOutputFormat.cpp, 00307): meta with CH type names, one
    element per column (invalid XML tag names fall back to <field>),
    &/< escaped, arrays as <array><elem>, tuples as <tuple><elem>,
    min/max blocks under SETTINGS extremes = 1, trailing row count."""
    import datetime
    import re

    def esc(s: str) -> str:
        return str(s).replace("&", "&amp;").replace("<", "&lt;")

    def tag(name: str) -> str:
        return (name if re.fullmatch(r"[A-Za-z_][\w.:-]*", name)
                else "field")

    def val(v) -> str:
        if v is None:
            return ""
        if isinstance(v, datetime.datetime):
            return v.strftime("%Y-%m-%d %H:%M:%S")
        if isinstance(v, datetime.date):
            return v.isoformat()
        if isinstance(v, list):
            return ("<array>" + "".join(
                f"<elem>{val(x)}</elem>" for x in v) + "</array>")
        if isinstance(v, tuple) or hasattr(v, "asDict"):
            return ("<tuple>" + "".join(
                f"<elem>{val(x)}</elem>" for x in list(v)) + "</tuple>")
        return esc(v)

    out = ["<?xml version='1.0' encoding='UTF-8' ?>", "<result>",
           "\t<meta>", "\t\t<columns>"]
    for nm, t in zip(names, ch_types):
        out += ["\t\t\t<column>",
                f"\t\t\t\t<name>{esc(nm)}</name>",
                f"\t\t\t\t<type>{esc(t)}</type>",
                "\t\t\t</column>"]
    out += ["\t\t</columns>", "\t</meta>", "\t<data>"]

    def block(rvals, indent):
        lines = []
        for nm, v in zip(names, rvals):
            t = tag(nm)
            cell = val(v)
            # embedded newlines stay REAL newlines inside the element
            lines.extend(
                f"{indent}<{t}>{cell}</{t}>".split("\n")
                if "\n" not in cell
                else (f"{indent}<{t}>{cell}</{t}>").split("\n")
            )
        return lines

    for r in rows:
        out.append("\t\t<row>")
        out.extend(block(list(r), "\t\t\t"))
        out.append("\t\t</row>")
    out.append("\t</data>")
    if extremes and rows:
        def agg(fn):
            cols = list(zip(*[list(r) for r in rows]))
            picked = []
            for c in cols:
                try:
                    picked.append(fn(c))
                except TypeError:
                    picked.append(c[0])
            return picked

        out.append("\t<extremes>")
        for label, fn in (("min", min), ("max", max)):
            out.append(f"\t\t<{label}>")
            out.extend(block(agg(fn), "\t\t\t"))
            out.append(f"\t\t</{label}>")
        out.append("\t</extremes>")
    out.append(f"\t<rows>{len(rows)}</rows>")
    out.append("</result>")
    return out
