"""Document sources: file/bytes ingest, aggregator streams, fixtures."""
