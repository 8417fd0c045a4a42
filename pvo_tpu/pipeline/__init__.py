"""VO<->VPS pipeline glue: shared_data artifacts, tracking, matching,
PQ/VPQ evaluation."""
