"""Engine operators: the sync core (diff / merge / incremental / state /
schema drift) plus the LLM-data-pipeline operators (dedup, simsearch, text,
multimodal) and the as-of join."""
