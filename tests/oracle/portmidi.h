// Minimal PortMidi surface so the reference's rt.resynth.lib.midi.cpp
// compiles as a test oracle. The message-packing macros follow the public
// PortMidi API contract (status in the low byte, data1/data2 in the next
// bytes); the device/stream functions are stubs the oracle never calls
// (only `decode`, the event structs, and NoteIdsGenerator run).
// Original shim code; nothing copied from PortMidi or the reference.
#pragma once

#include <cstdint>

typedef int32_t PmMessage;
typedef int32_t PmTimestamp;
typedef int PmError;
typedef int PmDeviceID;
typedef void PortMidiStream;

constexpr PmError pmNoError = 0;
constexpr PmError pmNoData = 0;
constexpr PmError pmGotData = 1;
constexpr PmError pmBufferOverflow = -9971;

#define Pm_Message(status, data1, data2) \
  ((((data2) << 16) & 0xFF0000) | (((data1) << 8) & 0xFF00) | ((status) & 0xFF))
#define Pm_MessageStatus(msg) ((msg) & 0xFF)
#define Pm_MessageData1(msg) (((msg) >> 8) & 0xFF)
#define Pm_MessageData2(msg) (((msg) >> 16) & 0xFF)

typedef struct {
  PmMessage message;
  PmTimestamp timestamp;
} PmEvent;

typedef struct {
  int structVersion;
  const char* interf;
  const char* name;
  int input;
  int output;
  int opened;
} PmDeviceInfo;

inline PmError Pm_Initialize() { return pmNoError; }
inline PmError Pm_Terminate() { return pmNoError; }
inline int Pm_CountDevices() { return 0; }
inline const PmDeviceInfo* Pm_GetDeviceInfo(PmDeviceID) { return nullptr; }
inline PmError Pm_OpenInput(PortMidiStream**, PmDeviceID, void*, int32_t,
                            PmTimestamp (*)(void*), void*) {
  return -1;
}
inline PmError Pm_Close(PortMidiStream*) { return pmNoError; }
inline PmError Pm_Poll(PortMidiStream*) { return pmNoData; }
inline int Pm_Read(PortMidiStream*, PmEvent*, int32_t) { return 0; }
inline const char* Pm_GetErrorText(PmError) { return "shim"; }
