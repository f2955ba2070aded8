"""The scan -> detections pipeline, assembled into one jitted step.

Reference threads (detection / raycast / background maintenance / rangefinder,
vofod_nodelet.cpp:1296-1393) become sequenced stages of a single pure function
with a deterministic schedule: point-update -> classify -> raycast-update ->
periodic background maintenance, with detection_its_diff == 1 per stage
application (SURVEY.md §7 design stance).
"""
