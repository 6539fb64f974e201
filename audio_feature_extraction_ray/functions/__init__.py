"""Pure (no-Ray) vectorized kernels: image codecs, image features, text features.

These are the single-process building blocks shared by the distributed stages
(stages/) and the serial test oracle (functions/oracle.py). They use only
NumPy + the standard library — no PIL / cv2 / librosa in this environment.
"""
