"""Time-dimension engine: calendar generation + time mappings.

The reference delegates these to the chronify library; here they are
native Spark calendar-DataFrame joins (SURVEY.md §2.10).
"""
