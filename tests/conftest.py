from __future__ import annotations

import os
import struct
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbc_informed_socketcan_to_parquet_spark.dbc.spec import DbcSpec, MessageSpec, SignalSpec
from dbc_informed_socketcan_to_parquet_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_spec() -> DbcSpec:
    """3-message DBC: scaled LE, signed LE, bool, flt32 reinterpret,
    Motorola BE, multiplexed pair — every type-rule branch."""
    return DbcSpec(
        messages=(
            MessageSpec(0x100, "ENGINE", 8, (
                SignalSpec("EngSpeed", 0, 12, "little", False, 0.5, -100.0),
                SignalSpec("EngTorque", 16, 16, "little", True, 1.0, 0.0),
                SignalSpec("EngActive", 32, 1, "little", False, 1.0, 0.0),
            )),
            MessageSpec(0x101, "SENSOR", 8, (
                SignalSpec("flt32_SensA", 0, 32, "little", False, 1.0, 0.0),
                SignalSpec("SensB", 47, 8, "big", False, 2.0, 0.0),
            )),
            MessageSpec(0x102, "MUX", 8, (
                SignalSpec("MuxA", 8, 8, "little", False, 1.0, 0.0, mux_switch_value=0),
                SignalSpec("MuxB", 8, 8, "little", False, 1.0, 0.0, mux_switch_value=1),
            ), mux_switch=SignalSpec("MuxSwitch", 0, 4, "little", False, 1.0, 0.0)),
        )
    )


TINY_DBC_TEXT = """
VERSION ""
BO_ 256 ENGINE: 8 ECU
 SG_ EngSpeed : 0|12@1+ (0.5,-100) [0|2000] "rpm" X
 SG_ EngTorque : 16|16@1- (1,0) [-500|500] "Nm" X
 SG_ EngActive : 32|1@1+ (1,0) [0|1] "" X
BO_ 257 SENSOR: 8 ECU
 SG_ flt32_SensA : 0|32@1+ (1,0) [0|0] "" X
 SG_ SensB : 47|8@0+ (2,0) [0|510] "" X
BO_ 258 MUX: 8 ECU
 SG_ MuxSwitch M : 0|4@1+ (1,0) [0|15] "" X
 SG_ MuxA m0 : 8|8@1+ (1,0) [0|255] "" X
 SG_ MuxB m1 : 8|8@1+ (1,0) [0|255] "" X
"""


def le_line(ts: float, can_id: int, payload: int) -> str:
    """Render a candump line from a little-endian payload word."""
    return f"({ts:.6f}) vcan0 {can_id:X}#{struct.pack('<Q', payload).hex().upper()}"


def f32_bits(x: float) -> int:
    return struct.unpack("<I", struct.pack("<f", x))[0]
