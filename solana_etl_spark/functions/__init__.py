from solana_etl_spark.functions.hashing import (
    MERSENNE_P,
    MINHASH_PERMS,
    PERM32_P,
    hash32,
    hash32_sql,
    hash64,
    hash64_sql,
    hashes_expr,
    minhash_from_hashes,
    minhash_sql,
    perm_hash,
    perm_hash_sql,
)

__all__ = [
    "hash32",
    "hash32_sql",
    "hash64",
    "hash64_sql",
    "hashes_expr",
    "minhash_from_hashes",
    "minhash_sql",
    "perm_hash",
    "perm_hash_sql",
    "MINHASH_PERMS",
    "MERSENNE_P",
    "PERM32_P",
]
