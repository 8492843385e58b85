#!/bin/bash
# 10s-interval CPU busy/steal logger — measurement-window annotation only.
while true; do
  read -r u1 s1 i1 <<< "$(awk '/^cpu /{print $2+$4, $9, $5}' /proc/stat)"
  sleep 10
  read -r u2 s2 i2 <<< "$(awk '/^cpu /{print $2+$4, $9, $5}' /proc/stat)"
  bu=$((u2-u1)); st=$((s2-s1)); id=$((i2-i1)); tot=$((bu+st+id))
  [ "$tot" -gt 0 ] && echo "$(date +%H:%M:%S) busy=$((100*bu/tot))% steal=$((100*st/tot))%"
done
