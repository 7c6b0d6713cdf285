"""Copy planning: the relational heart of the file-ETL engine."""
