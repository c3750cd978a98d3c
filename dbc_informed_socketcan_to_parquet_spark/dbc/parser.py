"""Minimal Vector-DBC text parser (public format; BO_/SG_ subset).

The reference delegates DBC parsing to the dbcppp library
(/root/reference/src/decoder.cpp:3-14); we need only the subset that drives
decoding — messages (``BO_``), signals (``SG_``) with start bit, length,
byte order, sign, factor/offset, and multiplexing markers.  The grammar used
here is the publicly documented DBC line format:

    BO_ <can_id> <MsgName>: <dlc> <sender>
     SG_ <SigName> [M|m<k>] : <start>|<len>@<order><sign> (<factor>,<offset>) [<min>|<max>] "<unit>" <receivers>

with ``@1``/``@0`` = Intel (little) / Motorola (big) byte order and
``+``/``-`` = unsigned / signed.
"""

from __future__ import annotations

import re

from dbc_informed_socketcan_to_parquet_spark.dbc.spec import DbcSpec, MessageSpec, SignalSpec

_BO_RE = re.compile(r"^BO_\s+(\d+)\s+(\w+)\s*:\s*(\d+)\s+(\w+)")
_SG_RE = re.compile(
    r"^\s*SG_\s+(\w+)\s*(M|m\d+)?\s*:\s*"
    r"(\d+)\|(\d+)@([01])([+-])\s*"
    r"\(\s*([-+0-9.eE]+)\s*,\s*([-+0-9.eE]+)\s*\)"
)
#: VAL_ <can_id> <SigName> <int> "<label>" ... ;  (signal value tables)
_VAL_RE = re.compile(r"^VAL_\s+(\d+)\s+(\w+)\s+(.*);")
_VAL_PAIR_RE = re.compile(r'(-?\d+)\s+"([^"]*)"')

#: CAN extended-frame flag bit that DBC files set on 29-bit ids.
_EXT_FLAG = 0x80000000


def parse_dbc_text(text: str) -> DbcSpec:
    messages: list[MessageSpec] = []
    value_tables: dict[tuple[int, str], dict[int, str]] = {}
    cur_id: int | None = None
    cur_name = ""
    cur_len = 8
    cur_signals: list[SignalSpec] = []
    cur_mux: SignalSpec | None = None

    def flush() -> None:
        nonlocal cur_id, cur_signals, cur_mux
        if cur_id is not None:
            messages.append(
                MessageSpec(
                    can_id=cur_id,
                    name=cur_name,
                    length=cur_len,
                    signals=tuple(cur_signals),
                    mux_switch=cur_mux,
                )
            )
        cur_id, cur_signals, cur_mux = None, [], None

    for line in text.splitlines():
        bo = _BO_RE.match(line.strip())
        if bo:
            flush()
            raw_id = int(bo.group(1))
            cur_id = raw_id & ~_EXT_FLAG
            cur_name = bo.group(2)
            cur_len = int(bo.group(3))
            continue
        sg = _SG_RE.match(line)
        if sg and cur_id is not None:
            name, mux_tag, start, length, order, sign, factor, offset = sg.groups()
            spec = SignalSpec(
                name=name,
                start_bit=int(start),
                bit_length=int(length),
                byte_order="little" if order == "1" else "big",
                is_signed=sign == "-",
                factor=float(factor),
                offset=float(offset),
                mux_switch_value=int(mux_tag[1:]) if mux_tag and mux_tag.startswith("m") else None,
            )
            if mux_tag == "M":
                cur_mux = spec
            else:
                cur_signals.append(spec)
            continue
        val = _VAL_RE.match(line.strip())
        if val:
            vid = int(val.group(1)) & ~_EXT_FLAG
            pairs = {int(v): label for v, label in _VAL_PAIR_RE.findall(val.group(3))}
            value_tables[(vid, val.group(2))] = pairs
    flush()
    return DbcSpec(messages=tuple(messages), value_tables=value_tables)


def parse_dbc(path: str) -> DbcSpec:
    with open(path, encoding="utf-8", errors="replace") as fh:
        return parse_dbc_text(fh.read())
