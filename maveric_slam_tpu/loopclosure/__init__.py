"""BoW loop closure: vocabulary scoring, candidate detection, correction."""
