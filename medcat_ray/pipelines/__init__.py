"""End-to-end Ray Data pipelines (read → stages → write) and the
partition-resumable runner."""
