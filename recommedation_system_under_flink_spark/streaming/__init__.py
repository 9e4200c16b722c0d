"""Structured Streaming extension (SURVEY §7.4a).

The reference's "real time" is a driver-side Java loop resubmitting one
batch job per calendar day (TextRank.java:231-310 — SURVEY §0); this
package makes the daily loop a real event-time computation.
"""
