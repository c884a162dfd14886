"""Map/track stores: device-resident feature pool and covisibility."""
