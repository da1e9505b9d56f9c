"""Sources & sinks: the synthetic Common-Crawl-style pages world,
parquet snapshot tables, and result export."""
