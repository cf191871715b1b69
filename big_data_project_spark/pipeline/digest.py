"""The cross-engine rebuild-digest contract, in ONE place.

Several queries prove that both engines rebuilt byte-identical documents
by summing a 60-bit prefix of each document's md5 modulo a prime:

    Spark : pmod(conv(substring(h, 1, 15), 16, 10)::bigint, 1000000007)
    DuckDB: CAST('0x' || substr(h, 1, 15) AS BIGINT) % 1000000007

x32 (line dedup), x44 (boilerplate removal), x46 (vocab encode) and x47
(span corruption) all share this contract — a prefix-length or modulus
change in one copy would silently break the others' oracle parity, so
the Spark side lives here and the SQL template below is interpolated
into each oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DIGEST_MOD = 1_000_000_007


def md5_prefix_digest(h: Column | str) -> Column:
    """60-bit md5-prefix residue of an md5-hex column, as a bigint."""
    return F.pmod(
        F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint"), F.lit(DIGEST_MOD)
    )
