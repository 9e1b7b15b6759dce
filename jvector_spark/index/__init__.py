"""The inverted index: build pipeline, storage layout, codec, query path."""
