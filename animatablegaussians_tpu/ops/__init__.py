"""TPU-native compute ops: resampling, quaternions, SH, splatting, geometry."""
