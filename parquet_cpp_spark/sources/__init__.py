"""Sources: token-table construction (from driver testdata, deterministic
synthesis for bench) and table readers with an Iceberg-first fallback."""
