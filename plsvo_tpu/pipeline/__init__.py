"""Pipeline layer: functional state tables + host-side stage machine
(L3/L4 analogue of the reference's map.cpp / frame_handler_*.cpp)."""
