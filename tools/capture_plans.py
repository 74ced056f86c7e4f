"""Regenerate PLANS.md — captured physical plans of headline operators.
Run from the repo root: python tools/capture_plans.py
(the generation body lives inline in git history; see PLANS.md)"""
print("see git log for the generation snippet; PLANS.md is checked in")
