"""Query lifecycle: models → context → submitter."""
