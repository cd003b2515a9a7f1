"""Offline metric harnesses (detection mAP, identification VAL/FAR + accuracy)."""
