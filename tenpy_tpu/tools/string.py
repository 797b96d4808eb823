"""String formatting helpers (reference ``tenpy/tools/string.py``)."""

from __future__ import annotations

__all__ = ['is_non_string_iterable', 'vert_join', 'to_mathematica_lists', 'format_like_list']


def is_non_string_iterable(x):
    if isinstance(x, str):
        return False
    try:
        iter(x)
        return True
    except TypeError:
        return False


def vert_join(strlist, valign='t', halign='l', delim=' '):
    """Join multi-line string blocks horizontally (ASCII art; reference string.py:28)."""
    blocks = [s.split('\n') for s in strlist]
    heights = [len(b) for b in blocks]
    widths = [max((len(line) for line in b), default=0) for b in blocks]
    H = max(heights, default=0)
    out_lines = []
    for row in range(H):
        parts = []
        for b, h, w in zip(blocks, heights, widths):
            if valign == 't':
                idx = row
            elif valign == 'b':
                idx = row - (H - h)
            else:  # center
                idx = row - (H - h) // 2
            line = b[idx] if 0 <= idx < h else ''
            if halign == 'r':
                line = line.rjust(w)
            elif halign == 'c':
                line = line.center(w)
            else:
                line = line.ljust(w)
            parts.append(line)
        out_lines.append(delim.join(parts).rstrip())
    return '\n'.join(out_lines)


def to_mathematica_lists(a):
    try:
        iter(a)
    except TypeError:
        return str(a)
    return '{' + ', '.join(to_mathematica_lists(x) for x in a) + '}'


def format_like_list(*objs):
    return '[' + ', '.join(str(o) for o in objs) + ']'
