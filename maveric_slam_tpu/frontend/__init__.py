"""Feature frontend: extraction pipelines and the frame-to-frame tracker."""
