"""candump-log line parse / format as Column expressions.

Line format (``candump -l``): ``(epoch.frac) iface HEXID#HEXBYTES``
(reference parser: /root/reference/src/inputs/candump_parse.h:38-101).
Malformed lines are dropped — the reference skips them with a warning
(candump_parse.h:44-58) and treats 5 consecutive failures as EOF; in a
declarative engine "skip" is a filter.  Payloads longer than 8 bytes are
truncated to 8, matching CAN_MAX_DLEN handling (candump_parse.h:87-89).

Everything here is built-in-function algebra (``regexp_extract``, ``conv``,
``unhex``) — JVM-side, codegen'd, and safe under ANSI mode because the
regex gate runs before any numeric cast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Full-line validation + capture groups: (1) epoch seconds with optional
#: fraction, (2) interface, (3) hex CAN id, (4) hex payload (may be empty).
CANDUMP_REGEX = r"^\s*\((\d+(?:\.\d+)?)\)\s+(\S+)\s+([0-9A-Fa-f]{1,8})#(?:R\d?|([0-9A-Fa-f]*))\s*$"


def parse_candump_lines(
    lines: DataFrame,
    value_col: str = "value",
    keep_malformed: bool = False,
) -> DataFrame:
    """Parse a one-string-column DataFrame of candump lines into frames.

    Output schema: ``ts double`` (epoch seconds), ``iface string``,
    ``can_id long``, ``data binary`` (≤ 8 bytes, zero-padded by the decoder
    when shorter).  Remote-request frames (``#R``) parse with empty payload.
    """
    v = F.col(value_col)
    # ONE regex pass validates the line shape; field extraction then runs
    # on cheap split/substring ops (measured ~35% faster than four
    # regexp_extract passes — this is the per-frame hot path).
    ok = v.rlike(CANDUMP_REGEX)
    parts = F.split(F.trim(v), r"\s+")
    ts_tok = parts[0]
    ts = ts_tok.substr(F.lit(2), F.length(ts_tok) - F.lit(2)).cast("double")
    iface = parts[1]
    id_payload = F.split(parts[2], "#", 2)
    can_id = F.conv(id_payload[0], 16, 10).cast("long")
    # remote-request frames (#R / #R3) carry no payload
    payload_hex = F.when(id_payload[1].startswith("R"), F.lit("")).otherwise(id_payload[1])
    # odd-length hex (malformed pair) → drop the trailing nibble, like a
    # byte-pair loop would; >8 bytes → truncate to 8 (CAN_MAX_DLEN).
    trunc = F.substring(payload_hex, 1, 16)
    even_len = (F.length(trunc) / F.lit(2)).cast("int") * F.lit(2)
    data = F.unhex(trunc.substr(F.lit(1), even_len))
    if keep_malformed:
        return (
            lines.withColumn("ts", F.when(ok, ts))
            .withColumn("iface", F.when(ok, iface))
            .withColumn("can_id", F.when(ok, can_id))
            .withColumn("data", F.when(ok, data))
        )
    # Malformed-line DROP is expressed as a Generate (explode of a 0/1-element
    # array), not a Filter: Catalyst pushes a Filter on a synthesized column
    # through a round-robin Exchange by substituting the column's defining
    # expression, so a synth→fan_out→parse pipeline would run the whole
    # line-synthesis + regex chain BELOW the exchange (single-threaded on a
    # one-file scan) and again above it (measured r15: the entire decode
    # spine paid the synth twice).  A Generate never migrates through an
    # Exchange, the regex gate evaluates exactly once per row, and a NULL
    # array (the otherwise branch) drops the row just like the filter did.
    other = [c for c in lines.columns if c != value_col]
    frame = F.struct(
        ts.alias("ts"), iface.alias("iface"), can_id.alias("can_id"), data.alias("data")
    )
    return (
        lines.select(
            *other,
            F.explode(F.when(ok, F.array(frame))).alias("_f"),
        )
        .select(*other, "_f.ts", "_f.iface", "_f.can_id", "_f.data")
    )


def format_candump_line(
    ts_seconds: Column,
    iface: Column,
    can_id: Column,
    payload_hex: Column,
) -> Column:
    """Inverse of the parser — render frames as candump text lines.

    Used by the round-trip tests/oracles and by the candump *sink* (the
    reference has no such sink; we add it for symmetry so streams can be
    re-emitted in the wire format).
    """
    secs = F.floor(ts_seconds).cast("long")
    micros = F.round((ts_seconds - secs.cast("double")) * 1_000_000).cast("long")
    return F.format_string("(%d.%06d) %s %X#%s", secs, micros, iface, can_id, payload_hex)
