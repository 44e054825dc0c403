"""Sources: file discovery/partitioning and the HTTP/GraphQL source."""
