"""Engine operators: the sync core (diff / merge / incremental / state /
schema drift / quality auditing / incremental view maintenance /
partition repair in maintenance) plus the LLM-data-pipeline operators
(dedup, simsearch, text, multimodal incl. perceptual hashing) and the
as-of join."""
