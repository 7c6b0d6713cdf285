"""Physical operators: copy executor, attribute preservation, LLM ops."""
